package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= k
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
  }

  test("editDistancePairs k=1 is lossless vs brute force") {
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "kitte", 4L -> "kittens",
      5L -> "mitten", 6L -> "banana", 7L -> "bananas", 8L -> "kitten",
      9L -> "", 10L -> "a")
    val got = Dedup.editDistancePairs(rows.toDF("id", "s"), "id", "s", 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect.toSet
    assert(got == brute(rows, 1))
    assert(got.contains((1L, 8L, 0L)) && got.contains((1L, 2L, 1L)) &&
      got.contains((9L, 10L, 1L)))
  }

  test("editDistancePairs k=2 is lossless vs brute force") {
    val rnd = new scala.util.Random(3)
    val alphabet = "abc"
    val rows = (1L to 80L).map(i =>
      i -> (1 to (3 + rnd.nextInt(4))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = Dedup.editDistancePairs(rows.toDF("id", "s"), "id", "s", 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect.toSet
    assert(got == brute(rows, 2))
    assert(got.nonEmpty)
  }

  test("editDistancePairs rejects unsupported k") {
    val df = Seq(1L -> "x").toDF("id", "s")
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df, "id", "s", 3))
  }

  test("goldenRecord applies max/min/mode with low tie-break") {
    val df = Seq(
      (1, 50.0, "bob", "AUTO"), (1, 70.0, "alice", "AUTO"),
      (1, 60.0, "carol", "STEEL"),
      (2, 10.0, "dan", null), (2, 10.0, "erin", "FURN"))
      .toDF("cl", "bal", "name", "seg")
    val out = Dedup.goldenRecord(df, "cl", maxCols = Seq("bal"),
      minCols = Seq("name"), modeCols = Seq("seg"))
      .orderBy("cluster")
      .as[(Int, Long, Double, String, String)].collect.toSeq
    assert(out == Seq(
      (1, 3L, 70.0, "alice", "AUTO"),
      (2, 2L, 10.0, "dan", "FURN")))
  }

  test("goldenRecord: all-null mode column yields null, cluster kept") {
    val df = Seq((1, 5.0, Option.empty[String]), (1, 6.0, None))
      .toDF("cl", "bal", "seg")
    val out = Dedup.goldenRecord(df, "cl", maxCols = Seq("bal"),
      modeCols = Seq("seg"))
      .as[(Int, Long, Double, Option[String])].collect.toSeq
    assert(out == Seq((1, 2L, 6.0, None)))
  }

  test("mode tie on count breaks to the smallest value") {
    val df = Seq((1, "b"), (1, "b"), (1, "a"), (1, "a"), (1, "c"))
      .toDF("cl", "v")
    val out = Dedup.goldenRecord(df, "cl", modeCols = Seq("v"))
      .select("v_mode").as[String].collect.head
    assert(out == "a")
  }
}
