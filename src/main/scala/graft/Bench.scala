package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query doesn't absorb
    // session bring-up; uses the smallest sf regardless of target.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // Warm-touch every table (full column scan, not metadata count) so
    // first-touch parquet/page-cache I/O doesn't attach to whichever
    // query happens to read a table first — per-query attribution was
    // unstable without this (q15 absorbed the documents first read).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // events table
    new java.io.File(sfDir).listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach { f =>
        try {
          val df = spark.read.parquet(f.getAbsolutePath)
          df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        } catch { case _: Throwable => }
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
