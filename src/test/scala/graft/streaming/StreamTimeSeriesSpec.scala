package graft.streaming

import java.sql.{Date, Timestamp}

import graft.SparkSpec
import graft.operators.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ∘ batch parity for the daily-metrics chain: the
  * transformWithState daily grid must reproduce, value-for-value, what
  * gapFill → rollingSum → anomalies computes over the same events —
  * the round-4 "streaming twins for the time-series family" item.
  */
class StreamTimeSeriesSpec extends SparkSpec {

  private val day0 = java.time.LocalDate.parse("2024-01-01")
  private def tsAt(d: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(day0.plusDays(d).atTime(h, 0, 0))

  // 3 keys, 15 days, deterministic values, holes at different places;
  // every key observes day 0 (aligns the batch grid's global min with
  // each key's own start — the zero-fill comparison premise)
  private def points: Seq[StreamTimeSeries.Point] =
    for {
      k <- 1L to 3L
      d <- 0 until 15
      if !(k == 1L && Set(3, 4, 9)(d)) && !(k == 2L && Set(7)(d)) &&
        !(k == 3L && Set(1, 2, 11, 12, 13)(d))
      part <- 0 until 2 // two events per observed (key, day)
    } yield StreamTimeSeries.Point(k, tsAt(d, 6 + 6 * part),
      (k * 100 + d * 7 + part * 3) % 97)

  private def runStream(forward: Boolean): Seq[StreamTimeSeries.DayRow] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[StreamTimeSeries.Point]
    val name = s"ts_grid_${if (forward) "fwd" else "zero"}"
    val q = StreamTimeSeries.dailyGridStream(
        input.toDS().withWatermark("ts", "1 second"),
        days = 3, forward = forward, zDays = 5, minPoints = 3)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // two waves (state must survive across batches), then sentinel
      // events on a throwaway key push the watermark past day 14
      val (w1, w2) = points.partition(_.ts.getTime < tsAt(8).getTime)
      input.addData(w1: _*); q.processAllAvailable()
      input.addData(w2: _*); q.processAllAvailable()
      input.addData(StreamTimeSeries.Point(99L, tsAt(40), 1L))
      q.processAllAvailable()
      input.addData(StreamTimeSeries.Point(99L, tsAt(41), 1L))
      q.processAllAvailable()
      spark.table(name).as[StreamTimeSeries.DayRow].collect().toSeq
        .filter(_.key != 99L)
    } finally q.stop()
  }

  private def dailyBatch = {
    val s = spark
    import s.implicits._
    points.toDF("key", "ts", "v")
      .groupBy(col("key"), to_date(col("ts")).as("day"))
      .agg(sum("v").as("v"))
  }

  test("zero-fill grid: streaming rows == gapFill∘rollingSum∘anomalies") {
    val s = spark
    import s.implicits._
    val grid = TimeSeries.gapFill(dailyBatch, "key", "day", "v", forward = false)
    val rolling = TimeSeries.rollingSum(grid, "key", "day", "v", days = 3)
      .as[(Long, Date, Long, Long)].collect()
      .map { case (k, d, v, r) => (k, d.toString) -> (v, r) }.toMap
    val streamed = runStream(forward = false)
    // every key observes day 0 and day 14 → the streamed grid covers
    // the full batch span
    assert(streamed.size === rolling.size,
      s"rows: streamed ${streamed.size} vs batch ${rolling.size}")
    streamed.foreach { r =>
      val (v, roll) = rolling((r.key, r.day.toString))
      assert(v === r.v && roll === r.rolling, s"at ${(r.key, r.day)}")
    }
    // anomalies: batch flags |z| >= 1.2e6 over the zero-filled grid
    val thr = 1200000L
    val batchZ = TimeSeries.anomalies(grid, "key", "day", "v",
      days = 5, zThresholdMicro = thr, minPoints = 3)
      .select(col("key"), col("day").cast("string"), col("z_micro"))
      .as[(Long, String, Long)].collect().toSet
    val streamZ = streamed
      .collect { case r if r.z_micro.exists(z => math.abs(z) >= thr) =>
        (r.key, r.day.toString, r.z_micro.get) }.toSet
    assert(streamZ === batchZ)
    assert(batchZ.nonEmpty, "threshold chosen to flag at least one day")
  }

  test("ewmaStream: running fold converges to the batch ewmaHalfPerKey") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // unique ts per key; wave 2 delivers ts BETWEEN wave 1's (out of
    // order across batches — the buffer must reorder before folding)
    val mk = (k: Long, d: Int, v: Long) => StreamTimeSeries.Point(k, tsAt(d), v)
    val wave1 = Seq(mk(1, 0, 100), mk(1, 4, 60), mk(2, 0, 9))
    val wave2 = Seq(mk(1, 2, 40), mk(1, 6, 200), mk(2, 1, 81))
    val input = MemoryStream[StreamTimeSeries.Point]
    val q = StreamTimeSeries.ewmaStream(
        input.toDS().withWatermark("ts", "10 days"))
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
      input.addData(mk(99, 60, 1)); q.processAllAvailable()
      input.addData(mk(99, 90, 1)); q.processAllAvailable()
      val rows = spark.table("ewma_out").as[StreamTimeSeries.EwmaRow]
        .collect().filter(_.key != 99L)
      val finals = rows.groupBy(_.key).map { case (k, rs) =>
        k -> rs.maxBy(_.n) }
      val batch = graft.operators.TimeSeries.ewmaHalfPerKey(
        (wave1 ++ wave2).toDF("key", "ts", "v"), "key", "ts", "v")
        .collect().map(r => r.getAs[Long]("key") ->
          (r.getAs[Long]("n"), r.getAs[Long]("ewma_milli"))).toMap
      assert(finals.keySet === batch.keySet)
      finals.foreach { case (k, row) =>
        assert((row.n, row.ewma_milli) === batch(k), s"key $k") }
      // running updates pass through batch-fold intermediate values:
      // key 1 folds 100 → (100+40)/2=70 → (70+60)/2=65 → (65+200)/2=132
      assert(rows.filter(_.key == 1L).map(_.ewma_milli).toSet
        .subsetOf(Set(100L, 70L, 65L, 132L)))
    } finally q.stop()
  }

  test("late-first-observation key: stream starts at ITS day, batch backfills") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // key 1 observes from day 0; key 2 first appears on day 6 (with a
    // hole at day 8) — the leading-edge divergence case
    val pts = Seq(
      (1L, 0, 10L), (1L, 1, 11L), (1L, 3, 13L), (1L, 9, 19L),
      (2L, 6, 26L), (2L, 7, 27L), (2L, 9, 29L))
      .map { case (k, d, v) => StreamTimeSeries.Point(k, tsAt(d), v) }
    val input = MemoryStream[StreamTimeSeries.Point]
    val q = StreamTimeSeries.dailyGridStream(
        input.toDS().withWatermark("ts", "1 second"),
        days = 3, forward = false, zDays = 5, minPoints = 3)
      .writeStream.format("memory").queryName("ts_grid_late")
      .outputMode(OutputMode.Append()).start()
    val streamed = try {
      input.addData(pts: _*); q.processAllAvailable()
      input.addData(StreamTimeSeries.Point(99L, tsAt(40), 1L)); q.processAllAvailable()
      input.addData(StreamTimeSeries.Point(99L, tsAt(41), 1L)); q.processAllAvailable()
      spark.table("ts_grid_late").as[StreamTimeSeries.DayRow]
        .collect().toSeq.filter(_.key != 99L)
    } finally q.stop()
    val grid = TimeSeries.gapFill(
      pts.toDF("key", "ts", "v")
        .groupBy(col("key"), to_date(col("ts")).as("day"))
        .agg(sum("v").as("v")),
      "key", "day", "v", forward = false)
    val batch = TimeSeries.rollingSum(grid, "key", "day", "v", days = 3)
      .as[(Long, Date, Long, Long)].collect()
      .map { case (k, d, v, r) => (k, d.toString) -> (v, r) }.toMap
    // key 2's streamed grid starts at its first observed day (6), with
    // its in-span hole (day 8) still gap-filled
    val k2Days = streamed.filter(_.key == 2L).map(_.day.toString).sorted
    assert(k2Days === (6 to 9).map(d => day0.plusDays(d).toString))
    // batch backfills key 2 from the global min: exactly days 0..5 of
    // zero filler exist there and never stream
    val k2Extra = batch.keys.filter(_._1 == 2L).map(_._2).toSeq
      .filterNot(k2Days.contains).sorted
    assert(k2Extra === (0 to 5).map(d => day0.plusDays(d).toString))
    k2Extra.foreach(d => assert(batch((2L, d))._1 === 0L))
    // on the shared span every streamed row matches batch value-for-
    // value — including key 2's warm-up days: batch's trailing window
    // saw only zero filler there, which adds nothing to the sum
    streamed.foreach { r =>
      val (v, roll) = batch((r.key, r.day.toString))
      assert((v, roll) === (r.v, r.rolling), s"at ${(r.key, r.day)}")
    }
  }

  test("forward-fill grid: carried values match the batch forward fill") {
    val s = spark
    import s.implicits._
    val grid = TimeSeries.gapFill(dailyBatch, "key", "day", "v", forward = true)
    val batch = TimeSeries.rollingSum(grid, "key", "day", "v", days = 3)
      .where(col("v").isNotNull)
      .as[(Long, Date, Long, Long)].collect()
      .map { case (k, d, v, r) => (k, d.toString) -> (v, r) }.toMap
    val streamed = runStream(forward = true)
    assert(streamed.size === batch.size)
    streamed.foreach { r =>
      val (v, roll) = batch((r.key, r.day.toString))
      assert(v === r.v && roll === r.rolling, s"at ${(r.key, r.day)}")
    }
  }

  test("slidingDistinctStream: store breakpoints match batch slidingDistinct " +
    "through a compaction cycle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("sdmon").toFile
    // deterministic scatter: users revisit within and across windows
    val occs = for {
      k <- Seq("a", "b"); i <- 0 until 40
    } yield StreamTimeSeries.Occ(k, (i * 3 + (if (k == "a") 1 else 2)) % 7,
      tsAt((i * 5) % 13))
    val input = MemoryStream[StreamTimeSeries.Occ]
    val q = StreamTimeSeries.slidingDistinctStream(
      input.toDS().withWatermark("ts", "1 second"),
      days = 7, s"$tmp/store", s"$tmp/ckpt", compactEvery = 1) { (_, _) => () }
    try {
      val (w1, w2) = occs.partition(_.ts.getTime < tsAt(6).getTime)
      input.addData(w1: _*); q.processAllAvailable()
      input.addData(w2: _*); q.processAllAvailable()
      // sentinel key pushes the watermark past every real day
      input.addData(StreamTimeSeries.Occ("zz", 0L, tsAt(40)))
      q.processAllAvailable()
      input.addData(StreamTimeSeries.Occ("zz", 0L, tsAt(41)))
      q.processAllAvailable()
    } finally q.stop()

    val breakpoints = StreamTimeSeries
      .slidingDistinctFromStore(s, s"$tmp/store")
      .as[(String, Long, Long)].collect().toSeq
      .filter(_._1 != "zz")
    assert(breakpoints.nonEmpty)
    val batch = TimeSeries.slidingDistinct(
      occs.toDF("k", "u", "ts"), "k", "u", "ts", days = 7)
      .as[(String, Long, Long)].collect()
      .map { case (k, d, n) => (k, d) -> n }.toMap
    // every streamed breakpoint inside the batch grid matches exactly
    breakpoints.foreach { case (k, d, n) =>
      batch.get((k, d)).foreach(expected =>
        assert(n == expected, s"at ($k, $d)")) }
    // and the peak day agrees per key (the monitor's headline number)
    for (k <- Seq("a", "b")) {
      val got = breakpoints.filter(_._1 == k).map(_._3).max
      val want = batch.collect { case ((`k`, _), n) => n }.max
      assert(got == want, s"peak for $k")
    }
  }
}
