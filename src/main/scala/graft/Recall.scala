package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Knn, Pq}

/** Retrieval-quality artifact main (round-9 verdict ask #4): recall@k
  * of every PRODUCTION-hash (xxhash / seeded-gaussian) ANN index
  * against brute force, plus LSH candidate-pair recall at τ, at a
  * fixed scale factor with fixed seeds — committed per round as
  * RECALL_r{N}.json so retrieval-quality regressions are as visible
  * as speed regressions (BENCH) and value regressions (CORRECTNESS).
  * The exactness gates pin only the md5-portable oracle modes; this
  * artifact measures the modes a production deployment actually runs.
  *
  * Deterministic end-to-end: the corpus is the driver's parquet, index
  * builds hash with xxhash64 over fixed ids, LSH hyperplanes are
  * seed-pinned, and every ranking breaks ties on neighbor id — two
  * runs on the same testdata emit identical JSON (modulo the
  * timestamp). Emits ONE JSON line and mirrors it to
  * `RECALL_LOCAL.json` in the working directory.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.where(col("vec_id") % 100 === 0)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    // ground truth: exact cosine top-k per query
    val truth: Map[Long, Set[Long]] =
      Knn.bruteForce(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap

    def recallOf(hits: DataFrame): Double = {
      val got = hits.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val per = truth.map { case (q, ts) =>
        got.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
      }
      if (per.isEmpty) 0.0 else per.sum / per.size
    }
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"recall_$tag").toString

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // IVF (in-memory probe — the searchIvf candidate set is identical)
    results("ivf") = recallOf(Knn.ivf(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k, c = 16, nprobe = 4))

    // persisted ADC ladder: PQ (32x), RQ (16x), SQ8 (4x)
    locally {
      val d = tmp("ivfpq")
      Pq.writeIvfPqIndex(emb, "vec_id", "embedding", d, c = 16, m = 8,
        k = 16, dim = dim)
      results("ivfpq") = recallOf(Pq.searchIvfPq(spark, d, queries,
        "vec_id", "embedding", k, nprobe = 4, shortlist = 50))
    }
    locally {
      val d = tmp("ivfrq")
      Pq.writeIvfRqIndex(emb, "vec_id", "embedding", d, c = 16, m = 8,
        k = 16, dim = dim)
      results("ivfrq") = recallOf(Pq.searchIvfRq(spark, d, queries,
        "vec_id", "embedding", k, nprobe = 4, shortlist = 50))
    }
    locally {
      val d = tmp("ivfsq8")
      Pq.writeIvfSq8Index(emb, "vec_id", "embedding", d, c = 16, dim = dim)
      results("ivfsq8") = recallOf(Pq.searchIvfSq8(spark, d, queries,
        "vec_id", "embedding", k, nprobe = 4, shortlist = 50))
    }

    // binary quantization: the raw Hamming first stage, NO re-rank —
    // the honest recall of the 32x-compressed filter itself
    locally {
      val (mins, maxs) = Pq.sq8Train(emb, "embedding", dim)
      val th = Pq.bqThresholds(mins, maxs)
      val enc = Pq.bqEncode(emb, "vec_id", "embedding", th)
      results("bq_hamming") = recallOf(Pq.searchBq(enc, queries,
        "vec_id", "embedding", th, k))
    }

    // persisted NSW graph: build + multi-seed beam search
    locally {
      val d = tmp("graph")
      Knn.writeGraphIndex(emb, "vec_id", "embedding", d, k = 8, c = 16,
        nprobe = 2, buckets = 32)
      results("graph") = recallOf(Knn.searchGraphIndex(spark, d, queries,
        "vec_id", "embedding", beam = 12, hops = 4, k = k))
      graft.plans.Blocks.releaseAll(spark)
    }

    // LSH candidate-pair recall at tau = 0.45 (the semantic-dedup
    // gates' threshold — 144 true pairs at sf0.1, a real population):
    // hyperplane-bucketed pairs vs the exact >= tau pair set,
    // seed-pinned planes, banding-style OR amplification (4 planes x
    // 8 tables — collision prob per table (1 - theta/pi)^4)
    val tau = 0.45
    val lshPlanes = 4
    val lshTables = 8
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val truePairs = a.join(b, col("id_a") < col("id_b"))
      .where(graft.functions.Vectors.cosine(col("va"), col("vb")) >= tau)
      .count()
    val foundPairs = Dedup.embeddingPairs(emb, "vec_id", "embedding",
      tau = tau, planes = lshPlanes, dim = dim, seed = 7L,
      tables = lshTables).count()
    val lshRecall = if (truePairs == 0) 1.0
      else foundPairs.toDouble / truePairs

    def r4(x: Double): Double = math.round(x * 10000) / 10000.0
    val recallJson = results
      .map { case (n, r) => s"\"" + n + "\":" + r4(r) }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"recall_at_$k","sf":"$sfDir","k":$k,""" +
      s""""n_queries":${truth.size},"dim":$dim,"recall":$recallJson,""" +
      s""""lsh":{"tau":$tau,"planes":$lshPlanes,"tables":$lshTables,""" +
      s""""true_pairs":$truePairs,"found_pairs":$foundPairs,""" +
      s""""pair_recall":${r4(lshRecall)}},""" +
      s""""timestamp":"${java.time.Instant.now()}"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("RECALL_LOCAL.json"), json)
    catch { case e: Throwable =>
      System.err.println(s"[recall] artifact write failed: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
