package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits dimension-by-dimension") {
    val s = spark
    import s.implicits._
    // x=2 (0b10), y=1 (0b01) → z bits: b0 of x at 0 (0), b0 of y at 1
    // (1), b1 of x at 2 (1), b1 of y at 3 (0) → 0b0110 = 6
    val out = Seq((2L, 1L), (0L, 0L), (3L, 3L), (255L, 0L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(out(0) == 6L)
    assert(out(1) == 0L)
    assert(out(2) == 15L) // 0b1111: both low two bits set in both dims
    // 255 = 0b11111111 spread to even bit positions: 0b0101010101010101
    assert(out(3) == 0x5555L)
  }

  test("zorderWrite clusters BOTH dimensions; a plain sort clusters only one") {
    val s = spark
    import s.implicits._
    // 256×256 grid: every (x, y) cell once
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toFile
    Layout.zorderWrite(grid, Seq("x", "y"), bits = 8, numFiles = 16,
      path = s"$tmp/z.parquet")
    val back = spark.read.parquet(s"$tmp/z.parquet")
    assert(back.count() == 256L * 256L)
    def avgSpan(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val spans = df.groupBy(input_file_name().as("f"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }
    // ideal for 16 files on a 256×256 z-curve: 4 z-prefix bits = 2
    // bits per dimension = span 63 per file in BOTH x and y; allow
    // slack for range-sampler split points landing off tile borders
    val (sx, sy) = (avgSpan(back, "x"), avgSpan(back, "y"))
    assert(sx < 128 && sy < 128,
      s"z-order must cluster both dims (ideal 63): x=$sx y=$sy")
    // the single-column-sort baseline leaves the OTHER dim unclustered
    val tmp2 = java.nio.file.Files.createTempDirectory("xsort").toFile
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$tmp2/x.parquet")
    val xs = spark.read.parquet(s"$tmp2/x.parquet")
    assert(avgSpan(xs, "y") > 250,
      "baseline sanity: x-sorted files span all of y")
    assert(sy < avgSpan(xs, "y") / 2,
      s"z-order must beat the linear sort on the second dim: $sy")
  }
}
