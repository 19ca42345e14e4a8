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
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val cust = spark.read.parquet(s"$dir/customer.parquet")

    def time(name: String)(f: => Long): Unit = {
      f; f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"PROF $name%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
    }

    time("scan customer")(cust.count())
    val recs = cust.select(col("c_custkey").as("id"), col("c_name").as("v"),
      substring(col("c_name"), 1, 16).as("block"))
      .where(col("block").isNotNull)
    val groups = recs.groupBy("block")
      .agg(sort_array(collect_list(struct(col("id"), col("v")))).as("xs"))
      .where(size(col("xs")) <= 10000)
    time("groups")(groups.count())
    val pairs = groups
      .select(col("block"), col("xs"), posexplode(col("xs")))
      .select(col("block"),
        col("col").getField("id").as("id_a"),
        col("col").getField("v").as("v_a"),
        explode(slice(col("xs"), col("pos") + lit(2), size(col("xs")))).as("y"))
      .select(col("block"), col("id_a"), col("v_a"),
        col("y").getField("id").as("id_b"), col("y").getField("v").as("v_b"))
    time("pair stream")(pairs.count())
    val lenOk = pairs.where(col("id_a") =!= col("id_b"))
      .where(abs(length(col("v_a")) - length(col("v_b"))) <= 1)
    time("len filter")(lenOk.count())
    val verified = lenOk
      .withColumn("dist", levenshtein(col("v_a"), col("v_b"), 1).cast("long"))
      .where(col("dist") >= 0)
    time("banded verify")(verified.count())
    val full = graft.operators.Dedup.linkRecords(cust, "c_custkey", "c_name",
      substring(col("c_name"), 1, 16), maxDist = 1)
    time("full linkRecords")(full.count())
    spark.stop()
  }
}
