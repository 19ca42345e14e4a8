package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("applyChangeLog: latest wins, delete removes, base survives untouched keys") {
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "bal", "seg")
    val log = Seq(
      (1L, "2024-01-01 00:00:00", "U", 11.0, "a1", 1L),
      (1L, "2024-01-02 00:00:00", "U", 12.0, "a2", 2L),
      (2L, "2024-01-01 00:00:00", "D", 0.0, "x", 3L),
      // same-ts tie on key 4 (no base row): higher seq wins
      (4L, "2024-01-01 00:00:00", "U", 40.0, "d1", 4L),
      (4L, "2024-01-01 00:00:00", "U", 41.0, "d2", 5L))
      .toDF("k", "ts", "op", "bal", "seg", "seq")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Scd.applyChangeLog(base, log, "k", "ts", "op",
      Seq("bal", "seg"), tieCols = Seq("seq"))
      .orderBy("k").as[(Long, Double, String)].collect.toSeq
    assert(out == Seq((1L, 12.0, "a2"), (3L, 30.0, "c"), (4L, 41.0, "d2")))
  }

  test("applyChangeLog: delete then later upsert resurrects the key") {
    val base = Seq((1L, 1.0, "a")).toDF("k", "bal", "seg")
    val log = Seq(
      (1L, "2024-01-01 00:00:00", "D", 0.0, "x", 1L),
      (1L, "2024-01-02 00:00:00", "U", 2.0, "z", 2L))
      .toDF("k", "ts", "op", "bal", "seg", "seq")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Scd.applyChangeLog(base, log, "k", "ts", "op",
      Seq("bal", "seg"), tieCols = Seq("seq"))
      .as[(Long, Double, String)].collect.toSeq
    assert(out == Seq((1L, 2.0, "z")))
  }
}
