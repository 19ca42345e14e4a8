package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SCRATCH_OHA_FALLBACK", "128"))
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      f; f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROF $name%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
    }

    val n = 3; val maxDf = 1000
    time("scan docs")(docs.count())
    val shArr = array_distinct(graft.plans.native.wordShingles(col("text"), n))
    val shingled = docs.select(col("doc_id").as("id"),
        explode(arrays_zip(shArr.as("shingle"),
          array_repeat(size(shArr).cast("long"), size(shArr)).as("n_sh")))
          .as("e"))
      .select(col("id"), col("e.n_sh").as("n_sh"), col("e.shingle").as("shingle"))
    time("shingle explode")(shingled.count())
    val hot = shingled.groupBy("shingle")
      .agg(count(lit(1)).as("df")).where(col("df") > maxDf)
      .select("shingle")
    time("hot list")(hot.count())
    val capped = shingled.join(broadcast(hot), Seq("shingle"), "left_anti")
    time("capped")(capped.count())
    val groups = capped.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("id"), col("n_sh")))).as("xs"))
    time("groups collect_list")(groups.count())
    val stream = groups
      .select(col("xs"), posexplode(col("xs")))
      .select(col("col").getField("id").as("id_a"),
        col("col").getField("n_sh").as("n_a"),
        explode(slice(col("xs"), col("pos") + lit(2), size(col("xs")))).as("y"))
      .select(col("id_a"), col("n_a"),
        col("y").getField("id").as("id_b"),
        col("y").getField("n_sh").as("n_b"))
    time("pair stream")(stream.count())
    val agg = stream.groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= 0.5)
    time("pair agg+tau")(agg.count())
    val full = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, tau = 0.5, maxDf = 1000)
    time("full q16")(full.count())
    spark.stop()
  }
}
