package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Pq}

/** One-off dev probe: ADC-walk recall vs beam width on the sf0.1
  * uniform corpus (data-trained books) — sizing the graph_adc beam
  * operating point reported in RECALL_r13. */
object AdcBeamProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("adc-beam").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val k = 10
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 100 === 0)
    val truth = Knn.bruteForce(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val d = java.nio.file.Files.createTempDirectory("adcbeam").toString
    Knn.writeGraphIndex(emb, "vec_id", "embedding", d, k = 8, c = 16,
      nprobe = 2, buckets = 32, layers = 2)
    val tb = Pq.trainCodebooks(emb, "vec_id", "embedding", m = 8, k = 16,
      dim = 64)
    Knn.writeGraphCodes(spark, d, tb)
    for ((b, h) <- Seq((12, 4), (24, 4), (48, 3), (48, 4), (96, 3))) {
      val got = Knn.searchGraphIndexAdc(spark, d, tb, queries,
          "vec_id", "embedding", beam = b, hops = h, k = k)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val r = truth.map { case (q, ts) =>
        got.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
      }.sum / truth.size
      graft.plans.Blocks.releaseAll(spark)
      println(f"ADC beam=$b hops=$h recall=$r%.3f")
    }
    spark.stop()
  }
}
