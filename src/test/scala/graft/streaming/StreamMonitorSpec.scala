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
}
