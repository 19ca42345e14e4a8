package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("scratch2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val cols = Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey")
    def time(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PROF $name%-34s ${(System.nanoTime()-t0)/1e9}%8.3f s")
    }
    // (a) current operator
    time("compositeKeys maxArity=3") {
      graft.operators.KeyChecks.compositeKeys(li, cols, 3).collect()
    }
    // (b) the level-3 multi-distinct agg alone (the suspected cost)
    val combos3 = cols.combinations(3).toSeq
    time("level-3 one agg multi-distinct") {
      val aggs = combos3.zipWithIndex.flatMap { case (s, i) =>
        val anyNull = s.map(col(_).isNull).reduce(_ || _)
        Seq(count_distinct(struct(s.map(col): _*)).as(s"d$i"),
          coalesce(sum(when(anyNull, 1L).otherwise(0L)), lit(0L)).as(s"m$i")) }
      li.agg(aggs.head, aggs.tail: _*).head()
    }
    // (c) distinct-only (no null sums)
    time("level-3 distinct-only agg") {
      val aggs = combos3.zipWithIndex.map { case (s, i) =>
        count_distinct(struct(s.map(col): _*)).as(s"d$i") }
      li.agg(aggs.head, aggs.tail: _*).head()
    }
    // (d) per-combo distinct().count() sequential
    time("level-3 per-combo distinct.count") {
      combos3.foreach(s => li.select(s.map(col): _*).distinct().count())
    }
    // (e) per-combo concurrent
    time("level-3 per-combo concurrent") {
      import scala.concurrent._
      import scala.concurrent.duration._
      import ExecutionContext.Implicits.global
      val fs = combos3.map(s => Future(li.select(s.map(col): _*).distinct().count()))
      Await.result(Future.sequence(fs), 10.minutes)
    }
    spark.stop()
  }
}
