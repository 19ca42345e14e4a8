package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Long-running-behavior gates for the stateful streaming operators:
  * state must stay bounded by the watermark horizon (not grow with the
  * key universe), emissions must be complete, and events arriving
  * behind the watermark must not kill the query (the timeout-clamp
  * regression).
  */
class SoakSpec extends SparkSpec {

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000)

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000

  test("sessionizeStream soak: state bounded by watermark across many triggers") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.sessionizeStream(
        input.toDS().withWatermark("ts", "10 seconds"), gapSeconds = 60)
      .writeStream.format("memory").queryName("soak_sess")
      .outputMode(OutputMode.Append()).start()
    try {
      val triggers = 15
      val usersPerTrigger = 20
      for (t <- 0 until triggers) {
        // a fresh cohort of users each minute; prior cohorts' sessions
        // fall behind the watermark and must be evicted
        val cohort = (0 until usersPerTrigger).map { u =>
          Sessions.Event(t.toLong * usersPerTrigger + u, ts(base + t * 60L), 1.0)
        }
        input.addData(cohort: _*)
        q.processAllAvailable()
      }
      // push the watermark far ahead so every session times out
      input.addData(Sessions.Event(999999L, ts(base + 86400L), 0.0))
      q.processAllAvailable()
      input.addData(Sessions.Event(999998L, ts(base + 86500L), 0.0))
      q.processAllAvailable()

      val emitted = spark.table("soak_sess")
        .where(col("user_id") < triggers.toLong * usersPerTrigger).count()
      assert(emitted == triggers.toLong * usersPerTrigger,
        s"every cohort session must eventually emit (got $emitted)")
      // state holds only sessions newer than the watermark — the key
      // universe (300 users) must NOT accumulate
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 2 * usersPerTrigger,
        s"state grew with the key universe: $stateRows rows")
    } finally q.stop()
  }

  test("sessionizeStream survives events behind the watermark (timeout clamp)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Sessions.Event]
    val q = Sessions.sessionizeStream(
        input.toDS().withWatermark("ts", "1 second"), gapSeconds = 5)
      .writeStream.format("memory").queryName("soak_late")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Sessions.Event(1L, ts(base + 10000L), 1.0))
      q.processAllAvailable() // watermark ≈ base+10000-1
      // a stale event: its session would time out BEFORE the current
      // watermark. Spark 4 drops the row before the function (late-row
      // filtering), and the clamp guards the boundary where a timeout
      // would land exactly at/behind the watermark — either way the
      // query must keep running, not die on IllegalArgumentException.
      input.addData(Sessions.Event(2L, ts(base + 100L), 1.0))
      q.processAllAvailable()
      input.addData(Sessions.Event(3L, ts(base + 20000L), 1.0))
      q.processAllAvailable()
      input.addData(Sessions.Event(4L, ts(base + 30000L), 1.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      // on-time cohorts all closed; the late row was filtered, never
      // corrupting state (0 sessions) — both outcomes are ≤ 1 by spec
      assert(spark.table("soak_late").where(col("user_id") === 1L).count() == 1)
      assert(spark.table("soak_late").where(col("user_id") === 2L).count() <= 1)
      assert(spark.table("soak_late").where(col("user_id") === 3L).count() == 1)
    } finally q.stop()
  }

  test("stream-stream join matches within the time bound; state bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evIn = MemoryStream[(Long, Timestamp, Double)]
    val annIn = MemoryStream[(Long, Timestamp, String)]
    val joined = Sessions.joinStreams(
      evIn.toDS().toDF("user_id", "ts", "value"), "user_id", "ts",
      annIn.toDS().toDF("ann_user", "ats", "label"), "ann_user", "ats",
      windowSeconds = 10, watermark = "5 seconds")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val triggers = 10
      for (t <- 0 until triggers) {
        val t0 = base + t * 60L
        evIn.addData((t.toLong, ts(t0), 1.0))
        // one annotation inside the ±10 s bound, one outside
        annIn.addData((t.toLong, ts(t0 + 5), "in"), (t.toLong, ts(t0 + 40), "out"))
        q.processAllAvailable()
      }
      // advance both watermarks so all buffered state can be evicted
      evIn.addData((99999L, ts(base + 86400L), 0.0))
      annIn.addData((99998L, ts(base + 86400L), "x"))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      val out = spark.table("ssj_out")
      assert(out.where(col("label") === "in").count() == triggers)
      assert(out.where(col("label") === "out").count() == 0)
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 10,
        s"stream-stream join state not evicted: $stateRows rows")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched events after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evIn = MemoryStream[(Long, Timestamp, Double)]
    val annIn = MemoryStream[(Long, Timestamp, String)]
    val joined = Sessions.joinStreams(
      evIn.toDS().toDF("user_id", "ts", "value"), "user_id", "ts",
      annIn.toDS().toDF("ann_user", "ats", "label"), "ann_user", "ats",
      windowSeconds = 10, watermark = "5 seconds", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      evIn.addData((1L, ts(base), 1.0), (2L, ts(base), 2.0))
      annIn.addData((1L, ts(base + 3), "hit"))
      q.processAllAvailable()
      // advance both watermarks far past the join window
      evIn.addData((999L, ts(base + 10000L), 0.0))
      annIn.addData((998L, ts(base + 10000L), "x"))
      q.processAllAvailable()
      evIn.addData((997L, ts(base + 20000L), 0.0))
      annIn.addData((996L, ts(base + 20000L), "y"))
      q.processAllAvailable()
      assert(q.exception.isEmpty)
      val out = spark.table("ssj_outer")
      assert(out.where(col("user_id") === 1L && col("label") === "hit").count() == 1)
      // user 2 had no annotation in-window → emitted with null label
      assert(out.where(col("user_id") === 2L && col("label").isNull).count() == 1)
    } finally q.stop()
  }

  test("joinStreams resolves a shared key column name on both sides") {
    val s = spark
    import s.implicits._
    // batch frames exercise the same column-resolution path (the
    // watermark is a no-op in batch); both sides name the key "user_id"
    val ev = Seq((1L, ts(base), 1.0), (2L, ts(base), 2.0))
      .toDF("user_id", "ts", "value")
    val ann = Seq((1L, ts(base + 3), "hit"), (2L, ts(base + 40), "far"))
      .toDF("user_id", "ats", "label")
    val out = Sessions.joinStreams(ev, "user_id", "ts",
      ann, "user_id", "ats", windowSeconds = 10).collect()
    assert(out.length == 1 && out(0).getAs[String]("label") == "hit")
  }

  test("exactDedupStream soak: fingerprint state evicted at the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "ts")
    val q = StreamDedup.exactDedupStream(docs, "doc_id", "text", "ts",
        watermark = "30 seconds")
      .writeStream.format("memory").queryName("soak_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      val triggers = 12
      for (t <- 0 until triggers) {
        // each trigger: 10 fresh docs + 5 duplicates of the previous batch
        val fresh = (0 until 10).map(i =>
          (t * 100L + i, s"doc $t $i body", ts(base + t * 60L)))
        val dups = (0 until 5).map(i =>
          (9000L + t * 10 + i, s"doc $t $i body", ts(base + t * 60L + 1)))
        input.addData(fresh ++ dups: _*)
        q.processAllAvailable()
      }
      assert(q.exception.isEmpty)
      val out = spark.table("soak_dedup")
      // within a trigger's horizon the duplicate copies are suppressed
      assert(out.count() == triggers * 10)
      // state: fingerprints older than the watermark horizon are gone —
      // far fewer than the 120 distinct fingerprints seen overall
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= 30, s"dedup state not bounded: $stateRows rows")
    } finally q.stop()
  }
}
