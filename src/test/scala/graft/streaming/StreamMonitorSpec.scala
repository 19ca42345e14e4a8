package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamMonitorSpec extends SparkSpec {

  test("ksDriftStream: accumulated store drift == batch KS over the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ksmon").toFile
    // reference: uniform 0..19 in both strata
    val ref = (for (st <- Seq("s0", "s1"); v <- 0L until 20L; _ <- 1 to 3)
      yield (st, v)).toDF("st", "v")
    // live: s0 matches the reference, s1 drifts upward
    val wave1 = (for (v <- 0L until 20L) yield ("s0", v)) ++
      (for (v <- 10L until 30L) yield ("s1", v))
    val wave2 = (for (v <- 0L until 20L) yield ("s0", v)) ++
      (for (v <- 15L until 35L) yield ("s1", v))

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, (Long, Long, Long)])]
    val input = MemoryStream[(String, Long)]
    val q = StreamMonitor.ksDriftStream(
      input.toDF().toDF("st", "v"), "st", "v",
      ref, "st", "v",
      s"$tmp/store", s"$tmp/ckpt") { (drift, batchId) =>
      seen += batchId -> drift.collect().map(r =>
        r.getAs[String]("stratum") ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Long]("d_micro"))).toMap
    }
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(seen.map(_._1).toSeq === Seq(0L, 1L))
    // after both waves the store holds wave1 ∪ wave2: the drift frame
    // must equal the BATCH ksByStratum over ref ∪ accumulated live
    val both = ref.withColumn("g", org.apache.spark.sql.functions.lit("A"))
      .unionByName((wave1 ++ wave2).toDF("st", "v")
        .withColumn("g", org.apache.spark.sql.functions.lit("B")))
    val expect = Stats.ksByStratum(both, "st", "g", "A", "B", "v")
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("d_micro"))).toMap
    assert(seen.last._2 === expect)
    // the matching stratum shows near-zero drift; the shifted one is real
    val d0 = seen.last._2("s0")._3
    val d1 = seen.last._2("s1")._3
    assert(d1 > d0 && d1 >= 500000L, s"expected s1 drift, got s0=$d0 s1=$d1")
    assert(d0 === 0L, s"identical distributions must show zero drift, got $d0")

    // the store directory is independently consumable (offline reader)
    val refCounts = ref.groupBy(org.apache.spark.sql.functions.col("st").as("stratum"),
        org.apache.spark.sql.functions.col("v"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("ca"))
    val offline = StreamMonitor.ksAgainstStore(spark, refCounts, s"$tmp/store")
      .collect().map(r => r.getAs[String]("stratum") -> r.getAs[Long]("d_micro")).toMap
    assert(offline("s1") === d1)
  }

  test("ksDriftStream: compaction bounds the shard backlog across ≥3 cycles") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ksmonc").toFile
    val ref = (for (v <- 0L until 10L) yield ("s0", v)).toDF("st", "v")
    val input = MemoryStream[(String, Long)]
    var lastN = 0L
    val q = StreamMonitor.ksDriftStream(
      input.toDF().toDF("st", "v"), "st", "v",
      ref, "st", "v",
      s"$tmp/store", s"$tmp/ckpt", compactEvery = 2) { (drift, _) =>
      lastN = drift.collect().headOption.map(_.getAs[Long]("n_b")).getOrElse(0L)
    }
    try {
      // 7 batches → compactions at batchIds 2, 4, 6: three full cycles
      (1 to 7).foreach { i =>
        input.addData(("s0", (i % 10).toLong)); q.processAllAvailable()
      }
    } finally q.stop()
    // accumulated count survives every compaction exactly
    assert(lastN === 7L)
    // backlog stays bounded: after the batch-6 compaction at most the
    // compacted shard + the post-compaction batch shard remain
    val shards = new java.io.File(s"$tmp/store").listFiles().filter(_.isDirectory)
    assert(shards.length <= 2, shards.map(_.getName).mkString(","))
    assert(shards.exists(_.getName == "c6"), shards.map(_.getName).mkString(","))
  }

  test("compactShards: replayed batch shard and interrupted compaction stay exact") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ksmonr").toFile
    val store = s"$tmp/store"
    def shard(n: String, rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("stratum", "v", "cb").write.mode("overwrite").parquet(s"$store/$n")
    def total(): Long = StreamMonitor.readStore(spark, store)
      .agg(org.apache.spark.sql.functions.sum("cb")).as[Long].collect()(0)
    shard("b0", Seq(("s0", 1L, 3L), ("s0", 2L, 2L)))
    shard("b1", Seq(("s0", 1L, 1L)))
    // at-least-once replay: the same shard rewritten is absorbed, not added
    shard("b1", Seq(("s0", 1L, 1L)))
    assert(total() === 6L)
    // die-before-marker: a half-written target without a marker is
    // recomputed from the intact sources by the replayed compaction
    shard("c2", Seq(("s0", 99L, 999L))) // garbage from the "first attempt"
    StreamMonitor.compactShards(spark, store, "c2")
    assert(total() === 6L)
    val left = new java.io.File(store).listFiles().filter(_.isDirectory).map(_.getName)
    assert(left.toSeq === Seq("c2"))
    // replay after completion: no sources left → no-op, totals unchanged
    StreamMonitor.compactShards(spark, store, "c2")
    assert(total() === 6L)
    // die-mid-delete: marker present, one listed source already gone,
    // another still on disk — recovery deletes it WITHOUT recompute
    shard("b3", Seq(("s0", 5L, 4L)))
    shard("c4", Seq(("s0", 1L, 4L), ("s0", 2L, 2L), ("s0", 5L, 4L)))
    val marker = new java.io.File(s"$store/c4/_compacted_sources")
    java.nio.file.Files.writeString(marker.toPath, "c2\nb3\nbGONE")
    // c2 + b3 are already folded into c4 (the "first attempt" finished
    // its write); recovery must finish their deletes
    StreamMonitor.compactShards(spark, store, "c4")
    assert(total() === 10L)
    val after = new java.io.File(store).listFiles().filter(_.isDirectory).map(_.getName)
    assert(after.toSeq === Seq("c4"))
    assert(!marker.exists())
  }

  test("heavyHittersStream: exact accumulated top-k across triggers, store readable offline") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("hhmon").toFile
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(String, Long)])]
    val input = MemoryStream[String]
    val q = StreamMonitor.heavyHittersStream(
      input.toDF().toDF("k"), "k", k = 2,
      s"$tmp/store", s"$tmp/ckpt") { (top, batchId) =>
      seen += batchId -> top.collect().map(r =>
        (r.getAs[String]("key"), r.getAs[Long]("n"))).toSeq
    }
    try {
      input.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
      q.processAllAvailable()
      // second wave flips the leader: c surges past a
      input.addData(Seq.fill(9)("c") ++ Seq.fill(2)("b"): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._1) == Seq(0L, 1L))
    assert(seen.head._2 == Seq(("a", 5L), ("b", 3L)))
    // accumulated: a=5, b=5, c=10 -> top2 = c, then a/b tie broken by key
    assert(seen.last._2 == Seq(("c", 10L), ("a", 5L)))
    // offline reader sees the same accumulated counts
    val offline = StreamMonitor.topKFromStore(s, s"$tmp/store", 3)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"))).toSeq
    assert(offline == Seq(("c", 10L), ("a", 5L), ("b", 5L)))
  }

  test("misraGriesStream: exact-regime parity with batch heavyHitters, " +
    "counts bracket truth") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.TextAnalytics
    val tmp = java.nio.file.Files.createTempDirectory("mgmon").toFile
    val wave1 = Seq("apple apple banana", "apple cherry", "banana apple")
    val wave2 = Seq("cherry cherry apple", "banana banana banana date")
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(String, Long, Long)])]
    val input = MemoryStream[String]
    // k = 100 >> vocabulary: no decrements ever fire, so the summary
    // weights ARE the exact counts and n_min == true count
    val q = StreamMonitor.misraGriesStream(
      input.toDF().toDF("text"), "text", k = 100, topN = 3,
      s"$tmp/store", s"$tmp/ckpt") { (top, batchId) =>
      seen += batchId -> top.collect().map(r =>
        (r.getAs[String]("term"), r.getAs[Long]("n_min"),
          r.getAs[Long]("n_max"))).toSeq
    }
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._1) == Seq(0L, 1L))
    // parity oracle: the batch Misra–Gries operator over wave1 ∪ wave2
    val expect = TextAnalytics.heavyHitters(
      (wave1 ++ wave2).toDF("text"), "text", k = 100, topN = 3)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("n"))).toSeq
    assert(seen.last._2.map(t => (t._1, t._2)) == expect, seen.last._2)
    // exact regime: slack still reported (n_max = n_min + N/(k+1))
    assert(seen.last._2.forall(t => t._3 >= t._2))
    // offline entry point sees the same accumulated frame
    val offline = StreamMonitor.heavyTermsFromStore(s, s"$tmp/store", 100, 3)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("n_min"))).toSeq
    assert(offline == expect)
  }

  test("misraGriesStream: small k keeps bounded state under compaction " +
    "and preserves the N/(k+1) guarantee") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("mgmonc").toFile
    // each wave: 30 "hot" tokens + 10 unique rare tokens
    def wave(i: Int): Seq[String] =
      Seq.fill(30)("hot") ++ (0 until 10).map(j => s"rare${i}x$j")
    var last = Seq.empty[(String, Long, Long)]
    val input = MemoryStream[String]
    val q = StreamMonitor.misraGriesStream(
      input.toDF().toDF("text"), "text", k = 2, topN = 2,
      s"$tmp/store", s"$tmp/ckpt", compactEvery = 2) { (top, _) =>
      last = top.collect().map(r =>
        (r.getAs[String]("term"), r.getAs[Long]("n_min"),
          r.getAs[Long]("n_max"))).toSeq
    }
    try {
      for (i <- 0 until 3) {
        input.addData(wave(i).mkString(" ")); q.processAllAvailable()
      }
    } finally q.stop()
    // N = 120, k = 2 → any term with c > 40 MUST survive; c(hot) = 90
    val hot = last.find(_._1 == "hot")
    assert(hot.nonEmpty, s"hot term evicted: $last")
    // the bracket holds: n_min ≤ 90 ≤ n_max, with n_max − n_min = ⌊N/3⌋
    assert(hot.get._2 <= 90L && hot.get._3 >= 90L, hot.get)
    // batchId 2 compacted shards b0..b2 into c2 with ≤ k counter rows
    val c2 = s.read.parquet(s"$tmp/store/c2")
    assert(c2.where($"v" === 0L).count() <= 2L, "MG reduction not applied")
    // shard dirs: only the compacted one survives its sources
    val dirs = new java.io.File(s"$tmp/store").listFiles().map(_.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
    assert(dirs.sorted.toSeq == Seq("c2"), dirs.toSeq)
  }

  test("multiNeedleScan composes onto a streaming frame statelessly " +
    "with batch parity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.TextAnalytics
    val rows = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"),
      (3L, "no hits here"), (4L, "gamma alpha gamma"))
    val needles = Seq("alpha", "beta", "gamma")
    val input = MemoryStream[(Long, String)]
    val q = TextAnalytics.multiNeedleScan(
      input.toDF().toDF("id", "text"), "id", "text", needles)
      .writeStream.format("memory").queryName("mns_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(2): _*); q.processAllAvailable()
      input.addData(rows.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val got = s.table("mns_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect = TextAnalytics.multiNeedleScan(
      rows.toDF("id", "text"), "id", "text", needles)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect, s"stream $got vs batch $expect")
    assert(got.nonEmpty && !got.exists(_._1 == 3L))
  }

  test("histStream: streamed cells answer the same quantiles and " +
    "selectivity as the batch HistStore over the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import graft.operators.HistStore
    val tmp = java.nio.file.Files.createTempDirectory("histmon").toFile
    val rows = (0 until 300).map(i => (s"k${i % 3}", (i * 17) % 400L))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(String, Long)]
    val q = StreamMonitor.histStream(
      input.toDF().toDF("k", "v"), "k", "v",
      lo = 0L, width = 50L, bins = 8,
      s"$tmp/store", s"$tmp/ckpt", compactEvery = 1) { (_, batchId) =>
      seen += batchId }
    try {
      val (w1, w2) = rows.splitAt(120)
      input.addData(w1: _*); q.processAllAvailable()
      input.addData(w2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(seen.toSeq == Seq(0L, 1L))

    // batch twin over the identical rows
    val btmp = java.nio.file.Files.createTempDirectory("histb").toString
    HistStore.write(rows.toDF("k", "v"), "k", "v", btmp,
      lo = 0L, width = 50L, bins = 8)
    val streamedCells = StreamMonitor.histCells(s, s"$tmp/store")
    val qs = Seq(250000L, 500000L, 900000L)
    val gotQ = HistStore.quantilesFromCells(streamedCells, 0L, 50L, qs)
      .orderBy("key", "q_micro")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    val wantQ = HistStore.quantiles(s, btmp, qs)
      .orderBy("key", "q_micro")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(gotQ == wantQ && gotQ.nonEmpty)
    val gotE = HistStore.estimateFromCells(streamedCells, 0L, 50L, 60L, 310L)
      .orderBy("key").as[(String, Long, Long)].collect.toSeq
    val wantE = HistStore.estimateRange(s, btmp, 60L, 310L)
      .orderBy("key").as[(String, Long, Long)].collect.toSeq
    assert(gotE == wantE && gotE.nonEmpty)
  }

  test("ruleAuditStream: accumulated audit == batch ruleAudit over " +
    "the union of waves") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("ramon").toFile
    val rules = Seq(
      "positive" -> (col("v") > 0L),
      "small" -> (col("v") < 100L))
    val wave1 = Seq(5L, -1L, 50L)
    val wave2 = Seq(200L, 7L, -2L, 3L)
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, (Long, Long, Long)])]
    val input = MemoryStream[Long]
    val q = StreamMonitor.ruleAuditStream(
      input.toDF().toDF("v"), rules,
      s"$tmp/store", s"$tmp/ckpt", compactEvery = 1) { (audit, batchId) =>
      seen += batchId -> audit.collect().map(r =>
        r.getAs[String]("rule") -> (r.getAs[Long]("n"),
          r.getAs[Long]("n_violations"), r.getAs[Long]("rate_micro"))).toMap
    }
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(seen.map(_._1).toSeq == Seq(0L, 1L))
    val expect = graft.operators.KeyChecks.ruleAudit(
      (wave1 ++ wave2).toDF("v"), rules)
      .collect().map(r => r.getAs[String]("rule") -> (r.getAs[Long]("n"),
        r.getAs[Long]("n_violations"), r.getAs[Long]("rate_micro"))).toMap
    assert(seen.last._2 == expect)
    assert(expect("positive") == ((7L, 2L, 285714L)))
    assert(expect("small") == ((7L, 1L, 142857L)))
  }

  test("ruleAuditStream: an empty micro-batch writes zero cells " +
    "instead of killing the query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.functions.{col, lit}
    val tmp = java.nio.file.Files.createTempDirectory("ramone").toFile
    val rules = Seq("positive" -> (col("v") > 0L))
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)] // (batchId, n, n_violations)
    val input = MemoryStream[Long]
    // the filter empties every micro-batch — the recovery/no-data shape
    val q = StreamMonitor.ruleAuditStream(
      input.toDF().toDF("v").where(lit(false)), rules,
      s"$tmp/store", s"$tmp/ckpt", compactEvery = 1) { (audit, batchId) =>
      val r = audit.collect().head
      seen += ((batchId, r.getAs[Long]("n"), r.getAs[Long]("n_violations")))
    }
    try {
      input.addData(5L, -1L); q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
    } finally q.stop()
    assert(seen.toSeq == Seq((0L, 0L, 0L)))
  }

  test("concurrencyStream: accumulated peak == batch maxConcurrent, " +
    "through a compaction cycle and out-of-order arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import java.sql.Timestamp
    def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    val tmp = java.nio.file.Files.createTempDirectory("ccmon").toFile
    // wave 1: k1 has 2 overlapping; wave 2 arrives EARLIER in time and
    // lifts the same span to 3; k2 stays at 1 (touching, half-open)
    val wave1 = Seq(("k1", ts(10), ts(20)), ("k1", ts(15), ts(25)),
      ("k2", ts(0), ts(10)), ("k2", ts(10), ts(20)))
    val wave2 = Seq(("k1", ts(5), ts(18)))

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, Long])]
    val input = MemoryStream[(String, Timestamp, Timestamp)]
    // compactEvery = 1: every post-zero batch folds the shards — the
    // peak after wave 2 is computed from a COMPACTED store
    val q = StreamMonitor.concurrencyStream(
      input.toDF().toDF("k", "st", "en"), "k", "st", "en",
      s"$tmp/store", s"$tmp/ckpt", compactEvery = 1) { (peak, batchId) =>
      seen += batchId -> peak.collect().map(r =>
        r.getAs[String]("key") -> r.getAs[Long]("max_concurrent")).toMap
    }
    try {
      input.addData(wave1: _*); q.processAllAvailable()
      input.addData(wave2: _*); q.processAllAvailable()
    } finally q.stop()

    assert(seen.map(_._1).toSeq == Seq(0L, 1L))
    assert(seen.head._2 == Map("k1" -> 2L, "k2" -> 1L))
    // batch ground truth over wave1 ∪ wave2
    val expect = graft.operators.TimeSeries.maxConcurrent(
      (wave1 ++ wave2).toDF("k", "st", "en"), "k", "st", "en")
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Long]("max_concurrent")).toMap
    assert(seen.last._2 == expect)
    assert(seen.last._2 == Map("k1" -> 3L, "k2" -> 1L))
    // offline reader over the compacted store agrees
    val offline = StreamMonitor.peakFromStore(s, s"$tmp/store")
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Long]("max_concurrent")).toMap
    assert(offline == seen.last._2)
  }
}
