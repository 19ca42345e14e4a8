package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Round-13 build-knob sweep for the uniform-regime graph ceiling
  * (r12 verdict ask #6): diversified stores at several (k, alpha)
  * points — all from the SAME kCand=16 / nprobe=4 candidate pool as
  * the k=8 diversified build, so build probe cost is constant — each
  * searched across the beam/hops grid with measured candidate
  * budgets. Goal: a point with recall ≥ 0.70 at ≤ 1000 cand/q (IVF
  * nprobe=8's operating point). Test-scoped dev harness:
  * `sbt "Test/runMain graft.SweepDivR13"`.
  */
object SweepDivR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("sweep-div").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Knn.countCandidates = true
    val k = 10
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 100 === 0)
    val nQ = queries.count()
    val truth = Knn.bruteForce(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val builds = Seq(
      ("k8_a10", 8, 1.0), ("k8_a115", 8, 1.15), ("k8_a13", 8, 1.3),
      ("k10_a11", 10, 1.1), ("k12_a10", 12, 1.0), ("k12_a115", 12, 1.15))
    val grid = Seq((12, 2), (16, 2), (20, 2), (12, 3), (16, 3), (12, 4),
      (14, 4))
    builds.foreach { case (tag, kk, alpha) =>
      val d = java.nio.file.Files.createTempDirectory(s"sw_$tag").toString
      Knn.writeGraphIndex(emb, "vec_id", "embedding", d, k = kk, c = 16,
        nprobe = 4, buckets = 32, layers = 2, alpha = alpha, kCand = 16)
      grid.foreach { case (b, h) =>
        Knn.lastScored = 0L
        val got = Knn.searchGraphIndex(spark, d, queries,
            "vec_id", "embedding", beam = b, hops = h, k = k)
          .select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).view
          .mapValues(_.map(_.getLong(1)).toSet).toMap
        val cand = math.round(Knn.lastScored.toDouble / nQ)
        val rec = truth.map { case (q, ts) =>
          got.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
        }.sum / truth.size
        graft.plans.Blocks.releaseAll(spark)
        println(f"""SWEEP {"build":"$tag","k":$kk,"alpha":$alpha,""" +
          f""""beam":$b,"hops":$h,"cand_per_q":$cand,"recall":$rec%.4f}""")
      }
    }
    spark.stop()
  }
}
