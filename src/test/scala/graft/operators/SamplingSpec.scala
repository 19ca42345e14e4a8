package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("stratifiedHead caps each stratum deterministically") {
    val s = spark
    import s.implicits._
    val df = (1 to 20).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "src")
    val out = Sampling.stratifiedHead(df, "src", "id", 3)
    assert(out.count() == 6)
    val aIds = out.where(col("src") === "a").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(aIds == Seq(2, 4, 6))
  }

  test("saltedAgg equals the direct aggregation") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // hot key: 90% of rows share one key
    val df = (1 to 1000).map { i =>
      (if (i <= 900) "hot" else s"k${i % 7}", rnd.nextDouble() * 100)
    }.toDF("k", "v")
    val salted = Sampling.saltedAgg(df, "k", "v").orderBy("k").collect()
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(org.apache.spark.sql.types.DecimalType(28, 4)))
          .cast("double").as("sum_value"))
      .orderBy("k").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getDouble(2) == b.getDouble(2)) // decimal path → exact
    }
  }

  test("writeClustered produces range-clustered files with bounded rows") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("clustered").toFile
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "payload")
    Sampling.writeClustered(df, s"$tmp/t.parquet", "id",
      numFiles = 4, maxRecordsPerFile = 3000)
    val back = spark.read.parquet(s"$tmp/t.parquet")
    assert(back.count() == 10000)
    // range clustering: each file's id span must not overlap others'
    val spans = back.groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }
}
