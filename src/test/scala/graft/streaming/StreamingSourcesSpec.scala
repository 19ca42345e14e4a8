package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming coverage beyond sessionization: file-source ingestion,
  * watermarked window aggregation, and streaming dedup — the
  * continuous twins of q30/q15.
  */
class StreamingSourcesSpec extends SparkSpec {

  test("parquet file source streams into a watermarked window agg") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream_src").toFile
    val staging = java.nio.file.Files.createTempDirectory("stream_staging").toFile
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:20:00"), "click", 2.0),
      (3L, Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0)
    ).toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.parquet(s"$staging/b1")
    // the file stream source lists plain files under `path` — move the
    // part file in, as an arriving-file producer would
    val part = new java.io.File(s"$staging/b1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dir, "data1.parquet").toPath)

    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE")
      .option("path", dir.getAbsolutePath)
      .format("parquet").load()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

    val q = stream.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val out = spark.table("win_out").collect()
      assert(out.length == 2)
      val clicks = out.find(_.getAs[String]("event_type") == "click").get
      assert(clicks.getAs[Long]("n") == 2)
    } finally q.stop()
  }

  test("StreamDedup pipeline: normalized-text dedup end-to-end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamDedup.exactDedupStream(
      input.toDS().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val q = out.writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "Hello  World", Timestamp.valueOf("2024-01-01 10:00:00")),
        (2L, "hello world", Timestamp.valueOf("2024-01-01 10:01:00")), // normalized dup
        (3L, "different doc", Timestamp.valueOf("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val ids = spark.table("sdedup_out").collect()
        .map(_.getAs[Long]("doc_id")).toSeq.sorted
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }

  test("nearDedupStream suppresses simhash-colliding documents") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamDedup.nearDedupStream(
      input.toDS().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val q = out.writeStream.format("memory").queryName("sneardup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta", Timestamp.valueOf("2024-01-01 10:00:00")),
        // identical token multiset → identical simhash → suppressed
        (2L, "ALPHA  beta gamma delta", Timestamp.valueOf("2024-01-01 10:01:00")),
        (3L, "omega psi chi phi", Timestamp.valueOf("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val ids = spark.table("sneardup_out").collect()
        .map(_.getAs[Long]("doc_id")).toSeq.sorted
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }

  test("nearDedupStreamMinhash flags verified LSH near-dups across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamDedup.nearDedupStreamMinhash(
      input.toDS().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      tau = 0.5, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("mh_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, base, Timestamp.valueOf("2024-01-01 10:00:00")),
        (2L, "totally unrelated words about engines", Timestamp.valueOf("2024-01-01 10:00:10")))
      q.processAllAvailable()
      input.addData( // later batch: near-dup of doc 1 + fresh doc
        (3L, base.replace("tok15", "tok15x"), Timestamp.valueOf("2024-01-01 10:01:00")),
        (4L, "more fresh content entirely different", Timestamp.valueOf("2024-01-01 10:01:10")))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val rows = spark.table("mh_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
      assert(rows.keySet == Set(1L, 2L, 3L, 4L))
      assert(!rows(1L) && !rows(2L) && !rows(4L))
      assert(rows(3L), s"near-dup of doc 1 not flagged: $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("nearDedupStreamEmbedding flags cosine near-dups via hyperplane buckets") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Long, Array[Double], Timestamp)]
    val out = StreamDedup.nearDedupStreamEmbedding(
      input.toDS().toDF("doc_id", "vec", "ts"), "doc_id", "vec", "ts",
      dim = 4, tau = 0.95, planes = 8, tables = 2, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("emb_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, Array(1.0, 0.2, -0.3, 0.5), Timestamp.valueOf("2024-01-01 10:00:00")),
        // orthogonal-ish direction: different buckets or cosine < tau
        (2L, Array(-0.4, 1.0, 0.8, -0.2), Timestamp.valueOf("2024-01-01 10:00:10")))
      q.processAllAvailable()
      input.addData( // later batch: scaled copy of doc 1 (cosine 1.0) + fresh doc
        (3L, Array(2.0, 0.4, -0.6, 1.0), Timestamp.valueOf("2024-01-01 10:01:00")),
        (4L, Array(0.1, -0.9, 0.3, 0.7), Timestamp.valueOf("2024-01-01 10:01:10")))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val rows = spark.table("emb_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
      assert(rows.keySet == Set(1L, 2L, 3L, 4L))
      assert(!rows(1L), s"first occurrence flagged: $rows")
      assert(rows(3L), s"scaled copy of doc 1 not flagged: $rows")
      assert(!rows(4L), s"fresh doc flagged: $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming exact dedup via dropDuplicatesWithinWatermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    case class Doc(fp: String, ts: Timestamp)
    val input = MemoryStream[(String, Timestamp)]
    val deduped = input.toDS().toDF("fp", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ("aaa", Timestamp.valueOf("2024-01-01 10:00:00")),
        ("aaa", Timestamp.valueOf("2024-01-01 10:05:00")), // dup inside watermark
        ("bbb", Timestamp.valueOf("2024-01-01 10:10:00")))
      q.processAllAvailable()
      input.addData(("aaa", Timestamp.valueOf("2024-01-01 10:20:00"))) // still dup
      q.processAllAvailable()
      val fps = spark.table("dedup_out").collect().map(_.getString(0)).toSeq
      assert(fps.sorted == Seq("aaa", "bbb"))
    } finally q.stop()
  }
}
