package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Knn, TextAnalytics}

/** Stage-timing harness for the q341 offender audit (round 13, r12
  * verdict ask #2): times each pipeline stage of the hybrid-retrieval
  * gate in isolation (cold then warm passes) so the 2 s-vs-0.4 s-oracle
  * residual can be attributed — two-tower work vs exchange dispatch
  * floor. Test-scoped main: `sbt "Test/runMain graft.ProfileQ341"`,
  * writes one JSON line; not part of the driver contract.
  */
object ProfileQ341 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .appName("profile-q341").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def queries = broadcast(docs.where(col("doc_id") % 100 === 0))
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        Seq("doc_id"))
      .select(col("doc_id").as("qid"),
        slice(filter(graft.plans.native.wordShingles(col("text"), 1),
          x => x =!= ""), 1, 3).as("terms"),
        col("embedding").as("qvec"))
    val results = (1 to 3).map { pass =>
      // stage 1: the gate's queries frame (broadcast join + tokenize)
      val s1 = t { queries.count() }
      // stage 2: term-union collect (one more queries execution)
      var termSet: Seq[String] = Nil
      val s2 = t {
        termSet = queries.select(explode(array_distinct(col("terms"))).as("t"))
          .distinct().collect().map(_.getString(0)).sorted.toSeq
      }
      // stage 3: the single corpus pass — tokenize + in-row prune +
      // observe stats + tf aggregate, materialized
      var tf: org.apache.spark.sql.DataFrame = null
      val obs = new org.apache.spark.sql.Observation()
      val s3 = t {
        tf = docs.select(col("doc_id").cast("long").as("id"),
            filter(graft.plans.native.wordShingles(col("text"), 1),
              t => t =!= "").as("tk"))
          .select(col("id"), size(col("tk")).cast("long").as("dl"),
            filter(col("tk"), t => t.isInCollection(termSet)).as("mtk"))
          .observe(obs, count(lit(1)).as("n"), sum("dl").as("s"))
          .select(col("id"), col("dl"), explode(col("mtk")).as("term"))
          .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
          .localCheckpoint(true)
      }
      val nDocs = obs.get("n").asInstanceOf[Long]
      val avgdl = obs.get("s").asInstanceOf[Long].toDouble / nDocs
      // stage 4: df window + qt join + per-(query, doc) sum + top-n
      val qt = broadcast(queries.select(col("qid").cast("long")
        .as("query_id"), explode(array_distinct(col("terms"))).as("term")))
      val dfW = count(lit(1)).over(Window.partitionBy("term"))
      val idf = log(lit(1.0) +
        (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      val denom = col("tf") + lit(1.2) *
        (lit(1.0 - 0.75) + lit(0.75) * (col("dl") / lit(avgdl)))
      val pairMicro = round(lit(1e6) *
        (idf * ((col("tf") * lit(2.2)) / denom))).cast("long")
      val wLex = Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("id").asc)
      val s4 = t {
        tf.withColumn("df", dfW).join(qt, Seq("term"))
          .groupBy("query_id", "id").agg(sum(pairMicro).as("score_micro"))
          .withColumn("lex_rank", row_number().over(wLex))
          .where(col("lex_rank") <= 20).count()
      }
      // stage 5: semantic tower alone
      val s5 = t {
        Knn.bruteForce(emb, "vec_id", "embedding",
          queries.select(col("qid"), col("qvec")), "qid", "qvec", 20).count()
      }
      // stage 6: the full operator end-to-end (fusion included)
      val s6 = t {
        TextAnalytics.hybridRetrieve(docs, "doc_id", "text",
          emb, "vec_id", "embedding", queries, "qid", "terms", "qvec",
          n = 20, k = 5).orderBy("query_id", "rank").count()
      }
      graft.plans.Blocks.releaseAll(spark)
      (pass, s1, s2, s3, s4, s5, s6)
    }
    results.foreach { case (p, s1, s2, s3, s4, s5, s6) =>
      println(f"""{"pass":$p,"queries":$s1%.3f,"term_collect":$s2%.3f,""" +
        f""""tf_pass":$s3%.3f,"lex_top":$s4%.3f,"sem_top":$s5%.3f,""" +
        f""""full_operator":$s6%.3f}""")
    }
    spark.stop()
  }
}
