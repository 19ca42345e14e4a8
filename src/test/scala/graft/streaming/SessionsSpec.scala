package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (2L, 100L, ts("2024-01-01 10:10:00"), "click", 2.0),
      (3L, 100L, ts("2024-01-01 11:30:00"), "view", 3.0), // > 30min gap → new session
      (4L, 200L, ts("2024-01-01 10:05:00"), "view", 4.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("batch sessionization splits on gap") {
    val out = Sessions.sessionizeBatch(eventsDf, gapSeconds = 1800)
      .orderBy("user_id", "session_seq").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2)   // user 100 session 1
    assert(out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1)   // user 100 session 2
    assert(out(2).getAs[Long]("user_id") == 200L)
  }

  test("event windows aggregate per hour and type") {
    val w = Sessions.eventWindows(eventsDf).collect()
    assert(w.length == 3) // (10h,click) (11h,view) (10h,view)
    val clicks = w.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[Long]("n_events") == 2)
  }

  test("transformWithState sessionizer matches the fMGWS twin (RocksDB store)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.sessionizeStreamTws(
        input.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 1800)
      .writeStream.format("memory").queryName("tws_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Sessions.Event(100L, ts("2024-01-01 10:00:00"), 1.0),
        Sessions.Event(100L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      input.addData(Sessions.Event(999L, ts("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Sessions.Event(998L, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val out = spark.table("tws_out").collect()
      val u100 = out.filter(_.getAs[Long]("user_id") == 100L)
      assert(u100.length == 1)
      assert(u100(0).getAs[Long]("n_events") == 2)
      assert(u100(0).getAs[Double]("sum_value") == 3.0)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming sessionization emits sessions after the gap timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Sessions.Event]
    val sessions = Sessions.sessionizeStream(
      input.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 1800)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(
        Sessions.Event(100L, ts("2024-01-01 10:00:00"), 1.0),
        Sessions.Event(100L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // advance watermark far past the session gap → timeout fires
      input.addData(Sessions.Event(999L, ts("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Sessions.Event(998L, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").collect()
      val u100 = out.filter(_.getAs[Long]("user_id") == 100L)
      assert(u100.length == 1)
      assert(u100(0).getAs[Long]("n_events") == 2)
      assert(u100(0).getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }
}

class BinarySpec extends SparkSpec {
  test("binary column plumbing: deterministic decode over batches") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val media = graft.multimodal.Binary.syntheticMedia(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = graft.multimodal.Binary.decodeFeatures(media)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).channels == 3 && feats(1L).features.length == 8)
    assert(feats(1L).width == 16 + ("hello world".length % 64))
    // decode is deterministic: same payload → same features
    val again = graft.multimodal.Binary.decodeFeatures(media)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(again(1L) == feats(1L).features.toSeq)
    val frames = graft.multimodal.Binary.sampleFrames(media, stride = 4)
    assert(frames.where(org.apache.spark.sql.functions.col("media_id") === 1).count() == 3)
  }

  test("size-aware decode repartitioning bounds per-task payload bytes") {
    val s = spark
    import s.implicits._
    // 64 docs of ~100 bytes → ~6.4 KB total; 1 KB target → ≥6 partitions
    val docs = (1 to 64).map(i => (i.toLong, "x" * 100)).toDF("doc_id", "text")
    val media = graft.multimodal.Binary.syntheticMedia(docs, "doc_id", "text")
    val parted = graft.multimodal.Binary.repartitionForDecode(media, 1024L)
    assert(parted.rdd.getNumPartitions >= 6)
    val perPart = parted.select("n_bytes").as[Long]
      .mapPartitions(it => Iterator.single(it.sum)).collect()
    // uniform hash spread: no partition should hold more than ~3× target
    assert(perPart.max <= 3 * 1024L, s"skewed decode partition: ${perPart.max}")
    val big = graft.multimodal.Binary.oversized(media, 99L)
    assert(big.count() == 64) // every payload is 100 bytes
    assert(graft.multimodal.Binary.oversized(media, 100L).count() == 0)
  }

  test("chunked decode merges fixed-size payload slices deterministically") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abcdefghij" * 10), (2L, "xy")).toDF("doc_id", "text")
    val media = graft.multimodal.Binary.syntheticMedia(docs, "doc_id", "text")
    // chunk larger than any payload → identical to the direct decode
    val direct = graft.multimodal.Binary.decodeFeatures(media)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val one = graft.multimodal.Binary.chunkedDecodeFeatures(media, 4096)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(one == direct)
    // small chunks: doc 1 (100 bytes) splits into 4 × 30-byte slices
    val chunked = graft.multimodal.Binary.chunkedDecodeFeatures(media, 30)
      .collect().map(f => f.media_id -> f).toMap
    assert(chunked(2L).features.toSeq == direct(2L)) // single chunk unchanged
    // multi-chunk output is deterministic across runs
    val again = graft.multimodal.Binary.chunkedDecodeFeatures(media, 30)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(again(1L) == chunked(1L).features.toSeq)
  }
}
