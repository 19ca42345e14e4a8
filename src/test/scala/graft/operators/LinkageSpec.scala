package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-6 linkage / data-quality operators: exact set-similarity join
  * (PPJoin prefix filter), sorted-neighborhood blocking, FD audit,
  * chi-square cells. Each is checked against a naive driver-side
  * ground truth so the pruning (prefix filter, banded join) is proven
  * LOSSLESS, not just plausible. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def naiveJaccard(docs: Seq[(Long, String)], tau: Double) = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      uni = (sa | sb).size
      if uni > 0 && inter.toDouble / uni >= tau
    } yield (ia, ib, sa.size.toLong, sb.size.toLong, inter.toLong,
      inter.toLong * 1000000L / uni)).toSet
  }

  test("setSimilarityJoin equals the exhaustive Jaccard join (prefix filter is lossless)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),      // J(1,2) = 3/5 = 0.6
      (3L, "alpha beta gamma delta extra"),  // J(1,3) = 4/5 = 0.8
      (4L, "zeta eta theta"),                // disjoint from 1-3
      (5L, "zeta eta theta"),                // J(4,5) = 1.0
      (6L, "Alpha BETA gamma delta"),        // case-folded == doc 1
      (7L, "only one shared alpha"),         // low overlap with 1
      (8L, ""))                              // empty set: no pairs
    val df = docs.toDF("id", "text")
    for (tau <- Seq(0.5, 0.7, 0.99)) {
      val got = Dedup.setSimilarityJoin(df, "id", "text", tau)
        .as[(Long, Long, Long, Long, Long, Long)].collect.toSet
      assert(got == naiveJaccard(docs, tau), s"tau=$tau")
    }
  }

  test("setSimilarityJoin tau=1.0 finds exact-set duplicates only") {
    val df = Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b")).toDF("id", "text")
    val got = Dedup.setSimilarityJoin(df, "id", "text", 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect.toSet
    assert(got == Set((1L, 2L))) // order-insensitive set equality
  }

  test("sortedNeighborhoodPairs equals the naive windowed pairs across partition boundaries") {
    // 20 rows over 4 shuffle partitions: band and range boundaries are
    // both crossed; ties on the blocking key fall back to id order.
    val rows = (1L to 20L).map(i => (i, s"k${(i % 5)}"))
    val df = rows.toDF("id", "blk")
    val w = 3
    val got = Dedup.sortedNeighborhoodPairs(df, "id", col("blk"), w)
      .select("id_a", "id_b", "gap").as[(Long, Long, Long)].collect.toSet
    val sorted = rows.map { case (id, k) => (k, id) }.sorted
    val naive = (for {
      i <- sorted.indices; j <- (i + 1) to math.min(i + w, sorted.size - 1)
    } yield (sorted(i)._2, sorted(j)._2, (j - i).toLong)).toSet
    assert(got == naive)
    assert(got.size == (sorted.size * w - w * (w + 1) / 2))
  }

  test("fdViolations finds only violating groups with witness values") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // violated: {x, y}
      (2L, "z"), (2L, "z"),            // fine
      (3L, "q"))                       // fine
      .toDF("k", "v")
    val got = KeyChecks.fdViolations(df, Seq("k"), "v")
      .as[(Long, Long, Long, String, String)].collect.toSeq
    assert(got == Seq((1L, 3L, 2L, "x", "y")))
  }

  test("chiSquareCells matches hand-computed micros on a 2x2 table") {
    // o: (a1,b1)=10 (a1,b2)=20 (a2,b1)=30 (a2,b2)=40; N=100
    // rt(a1)=30 rt(a2)=70; ct(b1)=40 ct(b2)=60
    // e(a1,b1) = 30*40/100 = 12 -> e_micro 12000000
    // contrib(a1,b1) = (10-12)^2/12 = 1/3 -> floor 333333
    val df = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2")) ++
      Seq.fill(30)(("a2", "b1")) ++ Seq.fill(40)(("a2", "b2"))).toDF("a", "b")
    val got = KeyChecks.chiSquareCells(df, "a", "b")
      .as[(String, String, Long, Long, Long, Long, Long)].collect
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("a1", "b1")) == ("a1", "b1", 10L, 30L, 40L, 12000000L, 333333L))
    assert(got(("a1", "b2")) == ("a1", "b2", 20L, 30L, 60L, 18000000L, 222222L))
    assert(got(("a2", "b1")) == ("a2", "b1", 30L, 70L, 40L, 28000000L, 142857L))
    assert(got(("a2", "b2")) == ("a2", "b2", 40L, 70L, 60L, 42000000L, 95238L))
  }

  test("chiSquareCells: perfectly independent table has zero contributions") {
    val df = (Seq.fill(2)(("a1", "b1")) ++ Seq.fill(4)(("a1", "b2")) ++
      Seq.fill(3)(("a2", "b1")) ++ Seq.fill(6)(("a2", "b2"))).toDF("a", "b")
    val got = KeyChecks.chiSquareCells(df, "a", "b")
      .select("contrib_micro").as[Long].collect.toSeq
    assert(got.forall(_ == 0L))
  }

  test("categoricalKl matches hand-computed smoothed terms; total >= 0") {
    val a = (Seq.fill(6)("x") ++ Seq.fill(2)("y")).toDF("v0")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("y") ++ Seq.fill(2)("z")).toDF("v0")
    val got = KeyChecks.categoricalKl(a, b, "v0")
      .as[(String, Long, Long, Long)].collect.map(r => r._1 -> r).toMap
    // union domain V=3; Na=8, Nb=8 -> denom 11 both sides
    def term(ca: Long, cb: Long): Long = {
      val pa = (ca + 1.0) / 11.0; val pb = (cb + 1.0) / 11.0
      math.round(1e6 * pa * math.log(pa / pb))
    }
    assert(got("x") == (("x", 6L, 2L, term(6, 2))))
    assert(got("y") == (("y", 2L, 4L, term(2, 4))))
    assert(got("z") == (("z", 0L, 2L, term(0, 2))))
    // Gibbs: the summed divergence is non-negative
    assert(got.values.map(_._4).sum >= 0)
  }

  test("categoricalKl of a distribution against itself is ~zero everywhere") {
    val a = (Seq.fill(5)("p") ++ Seq.fill(3)("q")).toDF("v0")
    val got = KeyChecks.categoricalKl(a, a, "v0")
      .select("kl_term_micro").as[Long].collect
    assert(got.forall(_ == 0L))
  }

  private def naiveCosine(docs: Seq[(Long, String)], tau: Double) = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      if sa.nonEmpty && sb.nonEmpty &&
        inter / math.sqrt(sa.size.toDouble * sb.size) >= tau
    } yield (ia, ib, sa.size.toLong, sb.size.toLong, inter.toLong)).toSet
  }

  test("cosineSetJoin equals the exhaustive cosine join (prefix filter lossless)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),     // cos = 3/4
      (3L, "alpha beta gamma delta extra"), // cos(1,3) = 4/√20 ≈ 0.894
      (4L, "zeta eta theta"),
      (5L, "zeta eta theta"),               // cos = 1
      (6L, "Alpha BETA gamma delta"),       // case-folded dup of 1
      (7L, "alpha lone token here four"),
      (8L, ""))
    val df = docs.toDF("id", "text")
    for (tau <- Seq(0.5, 0.75, 0.9, 1.0)) {
      val got = Dedup.cosineSetJoin(df, "id", "text", tau)
        .select("id_a", "id_b", "size_a", "size_b", "inter")
        .as[(Long, Long, Long, Long, Long)].collect.toSet
      assert(got == naiveCosine(docs, tau), s"tau=$tau")
    }
  }

  test("cosineSetJoin randomized: lossless across sizes and thresholds") {
    val rnd = new scala.util.Random(17)
    val vocab = (1 to 30).map(i => s"w$i")
    val docs = (1L to 60L).map(i =>
      i -> rnd.shuffle(vocab).take(3 + rnd.nextInt(8)).mkString(" "))
    for (tau <- Seq(0.4, 0.7)) {
      val got = Dedup.cosineSetJoin(docs.toDF("id", "text"), "id", "text", tau)
        .select("id_a", "id_b", "size_a", "size_b", "inter")
        .as[(Long, Long, Long, Long, Long)].collect.toSet
      assert(got == naiveCosine(docs, tau), s"tau=$tau")
    }
  }

  test("mutualInformationCells: independent columns ~0, dependent positive") {
    // independent: a ⊥ b uniform 2x2 → every term 0 exactly
    val ind = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val t0 = KeyChecks.mutualInformationCells(ind, "a", "b")
      .select("mi_term_micro").as[Long].collect
    assert(t0.length == 4 && t0.forall(_ == 0L))
    // perfectly dependent: a == b → MI = ln(2) over two cells
    val dep = (for (a <- Seq("x", "y"); _ <- 1 to 5)
      yield (a, a)).toDF("a", "b")
    val t1 = KeyChecks.mutualInformationCells(dep, "a", "b")
      .as[(String, String, Long, Long, Long, Long, Long)].collect
    assert(t1.length == 2)
    // each cell: (5/10)·ln(5·10/(5·5)) = 0.5·ln 2 → 346574 micros
    assert(t1.forall(_._7 == math.round(0.5 * math.log(2.0) * 1e6)))
  }

  test("calibrationBins: exact counts, clamped edges, empty-bin spine") {
    val df = Seq(
      (-500L, true),   // below range → bin 0
      (5000L, false), (9999L, true),   // bin 0
      (10000L, true),                  // bin 1 (left-closed edge)
      (95000L, false), (120000L, true) // bin 9 incl. overflow clamp
    ).toDF("v", "y")
    val out = Stats.calibrationBins(df, "v", "y", bins = 10,
      loMilli = 0L, hiMilli = 100000L)
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect.map(r => r._1 -> r).toMap
    assert(out.size == 10)
    assert(out(0L) == (0L, 0L, 10000L, 3L, 2L, Some(666666L)))
    assert(out(1L) == (1L, 10000L, 20000L, 1L, 1L, Some(1000000L)))
    assert(out(5L) == (5L, 50000L, 60000L, 0L, 0L, None))
    assert(out(9L) == (9L, 90000L, 100000L, 2L, 1L, Some(500000L)))
  }
}
