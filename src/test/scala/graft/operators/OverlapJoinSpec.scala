package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OverlapJoinSpec extends SparkSpec {
  import spark.implicits._

  private def iv(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "id", "s", "e")
      .withColumn("s", to_date($"s")).withColumn("e", to_date($"e"))

  test("overlapJoin finds exactly the overlapping same-key pairs") {
    val df = iv(
      (1L, 1L, "2024-01-01", "2024-01-10"),
      (1L, 2L, "2024-01-10", "2024-01-20"),  // touches 1 at the endpoint
      (1L, 3L, "2024-02-01", "2024-02-05"),  // disjoint
      (2L, 4L, "2024-01-05", "2024-01-06"))  // other key
    val got = AsOfJoin.overlapJoin(df, "k", "id", "s", "e")
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(got == Set((1L, 2L)))
  }

  test("overlapJoin: bin-spanning intervals pair once (first-shared-bin dedup)") {
    // both intervals span many 30-day bins; the pair must appear exactly once
    val df = iv(
      (1L, 1L, "2024-01-01", "2024-06-01"),
      (1L, 2L, "2024-02-15", "2024-07-01"))
    val got = AsOfJoin.overlapJoin(df, "k", "id", "s", "e")
      .select("id_a", "id_b").as[(Long, Long)].collect.toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("overlapJoin randomized: equals the naive quadratic join for any binDays") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 200L).map { i =>
      val start = rnd.nextInt(300)
      (rnd.nextInt(5).toLong, i, start, start + rnd.nextInt(90))
    }
    val df = rows.toDF("k", "id", "sd", "ed")
      .select($"k", $"id",
        date_add(lit("2024-01-01").cast("date"), $"sd").as("s"),
        date_add(lit("2024-01-01").cast("date"), $"ed").as("e"))
    val naive = rows.flatMap { case (k, i, s, e) =>
      rows.collect { case (k2, i2, s2, e2)
        if k2 == k && i < i2 && s <= e2 && s2 <= e => (i, i2) }
    }.toSet
    for (bin <- Seq(7, 30, 365)) {
      val got = AsOfJoin.overlapJoin(df, "k", "id", "s", "e", binDays = bin)
        .select("id_a", "id_b").as[(Long, Long)].collect.toSet
      assert(got == naive, s"binDays=$bin")
    }
  }
}
