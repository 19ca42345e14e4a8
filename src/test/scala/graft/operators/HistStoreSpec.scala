package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir = java.nio.file.Files.createTempDirectory("hist").toString

  test("sharded store == one-pass histogram; compaction changes nothing") {
    val rows = (1L to 500L).map(i => (s"k${i % 3}", (i * 7) % 400))
    val df = rows.toDF("key", "v")
    val path = tmpDir
    HistStore.write(df.where(col("v") % 2 === 0), "key", "v", path,
      lo = 0L, width = 25L, bins = 16)
    HistStore.append(df.where(col("v") % 2 === 1), "key", "v", path)
    val merged = HistStore.cells(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = rows.groupBy { case (k, v) =>
      (k, math.min(math.max(v / 25, 0L), 15L)) }
      .map { case (kb, g) => kb -> g.size.toLong }
    assert(merged === expect)
    // compaction folds shards to strata·bins rows, reads unchanged
    val before = spark.read.parquet(s"$path/cells").count()
    HistStore.compactStore(spark, path)
    val after = spark.read.parquet(s"$path/cells").count()
    assert(after <= before && after === merged.size.toLong)
    val merged2 = HistStore.cells(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged2 === merged)
  }

  test("out-of-range values clamp to the edge bins, no row dropped") {
    val df = Seq(("a", -50L), ("a", 0L), ("a", 399L), ("a", 99999L))
      .toDF("key", "v")
    val path = tmpDir
    HistStore.write(df, "key", "v", path, lo = 0L, width = 25L, bins = 16)
    val cells = HistStore.cells(spark, path)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(cells(0L) === 2L)  // -50 clamps into bin 0 beside the true 0
    assert(cells(15L) === 2L) // 399 (bin 15) and the 99999 clamp
    assert(cells.values.sum === 4L)
  }

  test("quantiles follow the exact ceil-rank lower-edge rule") {
    // key "u": 100 values 0..99, width 10 → bins 0..9 hold 10 each
    val df = (0L until 100L).map(("u", _)).toDF("key", "v")
    val path = tmpDir
    HistStore.write(df, "key", "v", path, lo = 0L, width = 10L, bins = 10)
    val q = HistStore.quantiles(spark, path,
      Seq(1L, 100000L, 500000L, 905000L, 1000000L))
      .collect().map(r => r.getAs[Long]("q_micro") ->
        (r.getAs[Long]("bin"), r.getAs[Long]("value_edge"))).toMap
    // rank(q) = ceil(q·100/1e6): q=1 → rank 1 → bin 0; q=0.1 → rank 10
    // → bin 0 (cum 10 ≥ 10); q=0.5 → rank 50 → bin 4; q=0.905 → rank
    // 91 → bin 9; q=1.0 → rank 100 → bin 9
    assert(q(1L)._2 === 0L)
    assert(q(100000L)._2 === 0L)
    assert(q(500000L)._2 === 40L)
    assert(q(905000L)._2 === 90L)
    assert(q(1000000L)._2 === 90L)
  }
}
