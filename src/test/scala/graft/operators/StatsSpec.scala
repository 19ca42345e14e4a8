package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("welchZ matches a hand-computed two-sample case") {
    // A: 1000, 2000, 3000 (n=3, mean 2000, var 1e6)
    // B: 1000, 1000 (n=2, mean 1000, var 0)
    val df = Seq(
      ("s", "a", 1000L), ("s", "a", 2000L), ("s", "a", 3000L),
      ("s", "b", 1000L), ("s", "b", 1000L))
      .toDF("st", "g", "v")
    val out = Stats.welchZ(df, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Option[Long])].collect.toSeq
    // z = 1000 / sqrt(1e6/3 + 0) = sqrt(3e6)/sqrt(3)... = 1000/577.35 = 1.7320508
    val (_, na, nb, d, z) = out.head
    assert(na == 3 && nb == 2 && d == 1000000L)
    assert(z.contains(math.round(math.sqrt(3.0) * 1e6)))
  }

  test("welchZ: stratum missing a group is dropped; n<2 gives NULL z") {
    val df = Seq(
      ("only_a", "a", 5L), ("only_a", "a", 6L),
      ("tiny", "a", 5L), ("tiny", "b", 7L), ("tiny", "b", 8L))
      .toDF("st", "g", "v")
    val out = Stats.welchZ(df, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Option[Long])].collect.toSeq
    assert(out.map(_._1) == Seq("tiny"))
    assert(out.head._5.isEmpty) // n_a = 1 → no z
  }

  test("skyline2d equals the NOT EXISTS ground truth, with groups and ties") {
    val df = Seq(
      // group g1: (1,5) and (2,4) and (4,1) on frontier; (3,5) dominated by (1,5)
      ("g1", 1L, 1L, 5L), ("g1", 2L, 2L, 4L), ("g1", 3L, 3L, 5L), ("g1", 4L, 4L, 1L),
      // duplicates: both kept (neither strictly dominates)
      ("g2", 5L, 1L, 1L), ("g2", 6L, 1L, 1L),
      // same x, different y: only smaller y survives
      ("g3", 7L, 2L, 9L), ("g3", 8L, 2L, 3L))
      .toDF("grp", "id", "x", "y")
    val got = Stats.skyline2d(df, "x", "y", Seq("grp"))
      .select("id").as[Long].collect.toSet
    val naive = {
      val rows = df.as[(String, Long, Long, Long)].collect
      rows.filter { case (g, _, x, y) =>
        !rows.exists { case (g2, _, x2, y2) =>
          g2 == g && x2 <= x && y2 <= y && (x2 < x || y2 < y) }
      }.map(_._2).toSet
    }
    assert(got == naive && got == Set(1L, 2L, 4L, 5L, 6L, 8L))
  }

  test("skyline2d randomized: window result == brute force") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val df = rows.toDF("id", "x", "y")
    val got = Stats.skyline2d(df, "x", "y").select("id").as[Long].collect.toSet
    val naive = rows.filter { case (_, x, y) =>
      !rows.exists { case (_, x2, y2) => x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._1).toSet
    assert(got == naive)
  }

  test("skyline2d plan is window-only — no join") {
    val df = Seq((1L, 1L, 1L)).toDF("id", "x", "y")
    val plan = Stats.skyline2d(df, "x", "y").queryExecution.optimizedPlan
    assert(!plan.toString.toLowerCase.contains("join"))
  }

  test("giniByKey: uniform → 0, single-holder → (n−1)/n, brute-force parity") {
    // 4 equal docs: perfectly even, G = 0
    val even = (1L to 4L).map(i => ("a", i, 100L)).toDF("src", "id", "x")
    val g0 = Stats.giniByKey(even, "src", "x", "id").collect()(0)
    assert(g0.getAs[Long]("gini_micro") === 0L)
    assert(g0.getAs[Long]("total") === 400L)
    // one doc holds everything: G = (n−1)/n = 0.75 for n = 4
    val one = Seq(("b", 1L, 0L), ("b", 2L, 0L), ("b", 3L, 0L), ("b", 4L, 80L))
      .toDF("src", "id", "x")
    assert(Stats.giniByKey(one, "src", "x", "id")
      .collect()(0).getAs[Long]("gini_micro") === 750000L)
    // zero-total keys dropped
    val zeros = Seq(("z", 1L, 0L), ("z", 2L, 0L)).toDF("src", "id", "x")
    assert(Stats.giniByKey(zeros, "src", "x", "id").count() === 0L)
    // randomized parity with the driver-side rank formula
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map(i => (s"k${i % 3}", i, rnd.nextInt(50).toLong))
    val got = Stats.giniByKey(rows.toDF("src", "id", "x"), "src", "x", "id")
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Long]("gini_micro")).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val xs = g.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.size.toDouble
      val s1 = xs.sum.toDouble
      val s2 = xs.zipWithIndex.map { case (x, j) => (j + 1).toDouble * x }.sum
      val expect = math.round((2.0 * s2 / (n * s1) - (n + 1.0) / n) * 1e6)
      assert(got(k) === expect, s"key $k")
    }
  }

  test("benfordDeviation: grid complete, proportions exact, constants canonical") {
    // digits by construction: 1×4, 2×2, 9×2, others absent; zero/negative dropped
    val df = Seq(("k", 1L), ("k", 15L), ("k", 123L), ("k", 1999L),
      ("k", 2L), ("k", 25L), ("k", 9L), ("k", 90L), ("k", 0L), ("k", -7L))
      .toDF("src", "v")
    val out = Stats.benfordDeviation(df, "src", "v")
      .orderBy("digit").collect()
    assert(out.length === 9) // the full 1..9 grid, absent digits as zeros
    val byDigit = out.map(r => r.getAs[Int]("digit") ->
      (r.getAs[Long]("n_d"), r.getAs[Long]("obs_micro"), r.getAs[Long]("dev_micro"))).toMap
    assert(byDigit(1)._1 === 4L && byDigit(1)._2 === 500000L)
    assert(byDigit(2)._1 === 2L && byDigit(9)._1 === 2L)
    assert(byDigit(3)._1 === 0L && byDigit(3)._2 === 0L)
    // Benford's law: expected proportions sum to 1e6 (±rounding)
    assert(math.abs(Stats.benfordExpectedMicro.values.sum - 1000000L) <= 2)
    assert(Stats.benfordExpectedMicro(1) === 301030L)
    // dev = obs − exp exactly
    out.foreach(r => assert(r.getAs[Long]("dev_micro") ===
      r.getAs[Long]("obs_micro") - r.getAs[Long]("exp_micro")))
  }

  test("ksByStratum matches the brute-force D statistic") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 400).map { i =>
      val st = s"s${i % 2}"
      val g = if (i % 3 == 0) "A" else "B"
      // group A shifted upward in stratum s1 → real drift there
      val v = rnd.nextInt(40).toLong + (if (g == "A" && st == "s1") 15L else 0L)
      (st, g, v)
    }
    val out = Stats.ksByStratum(rows.toDF("st", "g", "v"), "st", "g", "A", "B", "v")
      .collect().map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("d_micro"))).toMap
    rows.groupBy(_._1).foreach { case (st, g) =>
      val a = g.filter(_._2 == "A").map(_._3).sorted
      val b = g.filter(_._2 == "B").map(_._3).sorted
      val support = (a ++ b).distinct.sorted
      val d = support.map { x =>
        math.abs(a.count(_ <= x).toDouble / a.size - b.count(_ <= x).toDouble / b.size)
      }.max
      val (na, nb, dMicro) = out(st)
      assert(na === a.size.toLong && nb === b.size.toLong)
      assert(math.abs(dMicro - math.round(d * 1e6)) <= 1, s"stratum $st")
    }
    assert(out("s1")._3 > out("s0")._3, "shifted stratum must show more drift")
  }

  test("giniByKey: 90%-hot-key corpus stays exact") {
    // one source holds 90% of the rows with many distinct values —
    // the mixture-audit skew case the two-phase offsets exist for
    val rnd = new scala.util.Random(41)
    val rows = (1L to 1000L).map { i =>
      val k = if (i % 10 == 0) s"cold${i % 30}" else "hot"
      (k, i, rnd.nextInt(200).toLong)
    }
    val got = Stats.giniByKey(rows.toDF("src", "id", "x"), "src", "x", "id")
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n"), r.getAs[Long]("total"), r.getAs[Long]("gini_micro"))).toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val xs = g.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.size.toDouble
      val s1 = xs.sum.toDouble
      val s2 = xs.zipWithIndex.map { case (x, j) => (j + 1).toDouble * x }.sum
      val expect = math.round((2.0 * s2 / (n * s1) - (n + 1.0) / n) * 1e6)
      assert(got(k) === (g.size.toLong, xs.sum, expect), s"key $k")
    }
  }

  test("giniByKey: no row-scale window is partitioned by key alone") {
    // the hot-key guarantee, plan-gated: every window over pair-scale
    // data must be keyed by (key, bucket); the only key-only window
    // runs over the ≤ p-rows/key bucket subtotals (an aggregate child)
    val df = (1L to 40L).map(i => (s"s${i % 4}", i, i % 7)).toDF("src", "id", "x")
    val out = Stats.giniByKey(df, "src", "x", "id")
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = out.queryExecution.executedPlan
    val wins = plan.collect { case w: WindowExec => w } ++
      plan.collect { case a: AdaptiveSparkPlanExec => a }
        .flatMap(_.inputPlan.collect { case w: WindowExec => w })
    assert(wins.nonEmpty, s"expected window nodes:\n$plan")
    wins.foreach { w =>
      val keyOnly = w.partitionSpec.size < 2
      lazy val overBucketTotals = w.child.collect {
        case a: BaseAggregateExec
          if a.groupingExpressions.exists(_.toString.contains("__b")) => a
      }.nonEmpty
      assert(!keyOnly || overBucketTotals,
        s"key-only window over row-scale input:\n$w")
    }
  }

  test("winsorizePerKey clamps to exact type-1 percentiles per key") {
    import spark.implicits._
    // key a: values 1..10 -> p20 rank ceil(.2*10)=2 -> x_lo=2;
    // p80 rank 8 -> x_hi=8. key b: single value -> lo=hi=value.
    val df = ((1L to 10L).map(i => ("a", i, i * 10)) :+ (("b", 99L, 7L)))
      .toDF("k", "id", "v")
    val got = Stats.winsorizePerKey(df, "k", "v", "id", 200000L, 800000L)
      .as[(String, Long, Long, Long, Long, Long)].collect
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", 1L))._6 == 20L)   // 10 -> clamped up to p20=20
    assert(got(("a", 2L))._6 == 20L)
    assert(got(("a", 3L))._6 == 30L)   // inside band
    assert(got(("a", 8L))._6 == 80L)
    assert(got(("a", 9L))._6 == 80L)   // 90 -> clamped down to p80=80
    assert(got(("a", 10L))._6 == 80L)
    assert(got(("b", 99L)) == ("b", 99L, 7L, 7L, 7L, 7L))
  }

  test("winsorizePerKey: duplicate-heavy key and null passthrough") {
    import spark.implicits._
    val df = (Seq.fill(8)(5L) ++ Seq(1L, 100L)).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, Some(v)) }
      .toDF("k", "id", "v")
      .union(Seq(("k", 100L, Option.empty[Long])).toDF("k", "id", "v"))
    // sorted: 1,5x8,100 (n=10): p10 rank 1 -> 1; p90 rank 9 -> 5
    val got = Stats.winsorizePerKey(df, "k", "v", "id", 100000L, 900000L)
    import org.apache.spark.sql.functions.col
    val nullRow = got.where(col("id") === 100L).collect.head
    assert(nullRow.isNullAt(nullRow.fieldIndex("x_wins")))
    val big = got.where(col("id") === 9L).as[(String, Long, Long, Long, Long, Long)].collect.head
    assert(big == ("k", 9L, 100L, 1L, 5L, 5L))
  }

  test("mannWhitneyU matches the hand-computed rank sums with ties") {
    // stratum s: A = {1, 2, 2}, B = {2, 3}
    // sorted: 1(A) 2 2 2 (AAB tie run) 3(B)
    // avg rank of the 2-run: o=1, c=3 → 1 + 2 = 3; rank(1)=1, rank(3)=5
    // R_A = 1 + 3 + 3 = 7 → r2_a = 14; U_A = 7 − 6 = 1 → u2_a = 2
    val df = Seq(
      ("s", "a", 1L), ("s", "a", 2L), ("s", "a", 2L),
      ("s", "b", 2L), ("s", "b", 3L))
      .toDF("st", "g", "v")
    val out = Stats.mannWhitneyU(df, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect.head
    val (_, na, nb, r2, u2, z) = out
    assert(na == 3 && nb == 2 && r2 == 14L && u2 == 2L)
    // 2U−E[2U] = 2−6 = −4 → corrected −3; 4σ² = (6/3)·(6 − 24/20) = 9.6
    val expZ = math.round(-3.0 / math.sqrt(9.6) * 1e6)
    assert(z.contains(expZ))
  }

  test("mannWhitneyU randomized equals the per-row rank formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      ("s" + rnd.nextInt(3), if (rnd.nextBoolean()) "a" else "b",
        rnd.nextInt(15).toLong)
    }
    val df = rows.toDF("st", "g", "v")
    val got = Stats.mannWhitneyU(df, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect.map(r => (r._1, r._4)).toMap
    // naive: average ranks per stratum, doubled
    val want = rows.groupBy(_._1).map { case (st, rs) =>
      val sorted = rs.map(_._3).sorted
      val rankOf = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
      val r2a = rs.filter(_._2 == "a").map(r => 2 * rankOf(r._3)).sum
      st -> math.round(r2a)
    }
    assert(got == want)
  }

  test("nearestMatch1d picks the closer side, ties break low") {
    val a = Seq(("s", 1L, 10L), ("s", 2L, 14L), ("s", 3L, 100L),
      ("t", 4L, 5L), ("empty", 5L, 1L))
      .toDF("st", "id", "x")
    val b = Seq(("s", 8L), ("s", 12L), ("s", 16L), ("t", 5L))
      .toDF("st", "x")
    val out = Stats.nearestMatch1d(a, b, "st", "x", "id")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect.map(r => r._2 -> (r._4, r._5)).toMap
    assert(out(1L) == (Some(8L), Some(2L)))   // 8 vs 12 equidistant → low
    assert(out(2L) == (Some(12L), Some(2L)))  // 12 vs 16 → 12
    assert(out(3L) == (Some(16L), Some(84L))) // only predecessors
    assert(out(4L) == (Some(5L), Some(0L)))   // exact hit
    assert(out(5L) == (None, None))           // no controls in stratum
  }

  test("ols2PerKey recovers exact planes; collinear features yield NULL") {
    // y = 10 + 2*x1 + 3*x2 exactly, over a non-degenerate grid
    val plane = for (x1 <- 0L to 4L; x2 <- 0L to 3L)
      yield ("p", x1, x2, 10 + 2 * x1 + 3 * x2)
    // x2 = 2*x1 → singular normal matrix
    val collin = (0L to 9L).map(i => ("c", i, 2 * i, 5 + i))
    val df = (plane ++ collin).toDF("k", "x1", "x2", "y")
    val out = Stats.ols2PerKey(df, "k", "x1", "x2", "y")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect.map(r => r._1 -> r).toMap
    assert(out("p") == ("p", 20L, Some(10000000L), Some(2000000L), Some(3000000L)))
    assert(out("c")._3.isEmpty && out("c")._4.isEmpty && out("c")._5.isEmpty)
  }

  test("anovaF matches a hand-computed three-group case") {
    // groups: {1,2,3}, {4,5,6}, {7,8,9} — means 2,5,8; SSW = 2+2+2 = 6
    // SSB = 3·(9+0+9) = 54; F = (54/2)/(6/6) = 27
    val df = (for ((g, vs) <- Seq(("a", Seq(1L, 2L, 3L)),
      ("b", Seq(4L, 5L, 6L)), ("c", Seq(7L, 8L, 9L))); v <- vs)
      yield ("s", g, v)).toDF("st", "g", "v")
    val out = Stats.anovaF(df, "st", "g", "v")
      .as[(String, Long, Long, Option[Long])].collect.head
    assert(out._2 == 9 && out._3 == 3)
    assert(out._4.contains(27000000L))
  }

  test("anovaF: single group or zero within-variance yields NULL F") {
    val df = Seq(("one", "g", 5L), ("one", "g", 7L),
      ("const", "a", 4L), ("const", "a", 4L), ("const", "b", 9L),
      ("const", "b", 9L)).toDF("st", "g", "v")
    val out = Stats.anovaF(df, "st", "g", "v")
      .as[(String, Long, Long, Option[Long])].collect
      .map(r => r._1 -> r._4).toMap
    assert(out("one").isEmpty && out("const").isEmpty)
  }

  test("liftTable: exact slices, cumulative lift, tie runs stay together") {
    // 10 rows, scores 10..1, positives at scores 10, 9, 1
    val rows = (1L to 10L).map(x => (x, x == 10 || x == 9 || x == 1))
    val out = Stats.liftTable(rows.toDF("x", "y"), "x", "y", bins = 5)
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect.map(r => r._1 -> r).toMap
    // slice 0 = top 2 scores {10, 9}: both positive
    assert(out(0L) == (0L, 2L, 2L, 2L, 2L, Some((2L * 10 * 1000000L) / (2 * 3))))
    // final slice: all rows, lift = 1
    assert(out(4L) == (4L, 2L, 1L, 10L, 3L, Some(1000000L)))
  }

  test("liftTable randomized equals a driver-side replay") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(5) == 0))
    val bins = 10
    val got = Stats.liftTable(rows.toDF("x", "y"), "x", "y", bins)
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect.map(r => r._1 -> (r._2, r._3)).toMap
    val n = rows.size
    val byScore = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var o = 0L
    val naive = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((_, xs) <- byScore) {
      val slice = o * bins / n
      val (cn, cp) = naive.getOrElse(slice, (0L, 0L))
      naive(slice) = (cn + xs.size, cp + xs.count(_._2))
      o += xs.size
    }
    assert(got == naive.toMap)
  }

  test("nearestMatch1d randomized equals brute force") {
    val rnd = new scala.util.Random(5)
    val as = (1L to 200L).map(i => ("s" + rnd.nextInt(2), i, rnd.nextInt(1000).toLong))
    val bs = (1 to 150).map(_ => ("s" + rnd.nextInt(2), rnd.nextInt(1000).toLong))
    val got = Stats.nearestMatch1d(as.toDF("st", "id", "x"),
      bs.toDF("st", "x"), "st", "x", "id")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect.map(r => r._2 -> r._4).toMap
    val want = as.map { case (st, id, x) =>
      val cands = bs.filter(_._1 == st).map(_._2)
      id -> (if (cands.isEmpty) None
      else Some(cands.minBy(b => (math.abs(b - x), b))))
    }.toMap
    assert(got == want)
  }

  test("brownForsythe matches a hand-replayed median-deviation ANOVA") {
    // group a: 1,3,5 → median 3 (type-1 rank 2 of 3), |dev| = 2,0,2
    // group b: 10,10,10,20 → median 10 (rank 2 lands in the 10-run),
    //          |dev| = 0,0,0,10
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 10L), ("b", 10L), ("b", 10L), ("b", 20L)).toDF("g", "x")
    val out = Stats.brownForsythe(df, "g", "x")
      .as[(Long, Long, Option[Long])].collect.toSeq
    assert(out.size == 1)
    val (n, k, f) = out.head
    assert(n == 7 && k == 2)
    // replay the op's exact arithmetic: per-group q6-quantized ratio
    val ratioSum = (math.round(16.0 / 3.0 * 1e6) +
      math.round(100.0 / 4.0 * 1e6)).toDouble / 1e6
    val ssb = ratioSum - 14.0 * 14.0 / 7.0
    val ssw = 108.0 - ratioSum
    val want = math.round((ssb / 1.0) / (ssw / 5.0) * 1e6)
    assert(f.contains(want), s"got $f want $want")
  }

  test("brownForsythe: single group yields NULL F; null rows dropped") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      (null.asInstanceOf[String], Some(9L))).toDF("g", "x")
    val out = Stats.brownForsythe(df, "g", "x")
      .as[(Long, Long, Option[Long])].collect.toSeq
    assert(out == Seq((2L, 1L, None)))
  }

  test("corrMatrix: perfect/anti correlation, pairwise-complete " +
    "nulls, constant column → NULL") {
    val df = Seq(
      (Some(1L), Some(2L), Some(3L), Some(7L)),
      (Some(2L), Some(4L), Some(2L), Some(7L)),
      (Some(3L), Some(6L), Some(1L), Some(7L)),
      (Some(4L), None, Some(0L), Some(7L)) // b missing: (a,b) skips row
    ).toDF("a", "b", "c", "k")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c", "k")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got(("a", "b")) == ((3L, Some(1000000L))))   // y = 2x on 3 rows
    assert(got(("a", "c"))._1 == 4L)
    assert(got(("a", "c"))._2.contains(-1000000L))      // exact anti on 4
    assert(got(("a", "k")) == ((4L, None)))             // zero variance
    assert(got(("b", "c"))._2.contains(-1000000L))      // 3 shared rows
    assert(got.size == 6)
  }

  test("corrMatrix randomized equals a driver-side replay") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong,
        (rnd.nextInt(50) + rnd.nextInt(50)).toLong))
    val got = Stats.corrMatrix(rows.toDF("x", "y", "z"), Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.get(3).asInstanceOf[Long]).toMap
    def corr(xs: Seq[Long], ys: Seq[Long]): Long = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxx = xs.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val syy = ys.map(v => BigInt(v) * BigInt(v)).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * BigInt(y) }
        .sum.toDouble
      math.round((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)) * 1e6)
    }
    assert(got(("x", "y")) == corr(rows.map(_._1), rows.map(_._2)))
    assert(got(("x", "z")) == corr(rows.map(_._1), rows.map(_._3)))
    assert(got(("y", "z")) == corr(rows.map(_._2), rows.map(_._3)))
  }

  test("gumbelBlockMaxima matches the method-of-moments close") {
    val ts = Seq(
      ("2024-01-03 10:00:00", 4L), ("2024-01-20 11:00:00", 10L),
      ("2024-02-01 00:00:00", 20L), ("2024-02-15 09:30:00", 7L),
      ("2024-03-31 23:59:59", 30L))
      .map { case (t, v) => (java.sql.Timestamp.valueOf(t), v) }
      .toDF("ts", "v")
    val out = Stats.gumbelBlockMaxima(ts, "ts", "v")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect.toSeq
    assert(out.size == 1)
    val (nb, mean, beta, mu) = out.head
    assert(nb == 3) // maxima 10, 20, 30
    // replay: s=60, ss=1400, n=3 → mean 20, var 100
    val m = 60.0 / 3.0
    val vs = (1400.0 - 60.0 * 60.0 / 3.0) / 2.0
    val b = math.sqrt(vs * 6.0) / math.Pi
    assert(mean.contains(math.round(m * 1e6)))
    assert(beta.contains(math.round(b * 1e6)))
    assert(mu.contains(math.round((m - 0.5772156649015329 * b) * 1e6)))
  }

  test("gumbelBlockMaxima: one block → mean only; zero variance → NULL fit") {
    val one = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5L))
      .toDF("ts", "v")
    val o1 = Stats.gumbelBlockMaxima(one, "ts", "v")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect.head
    assert(o1 == ((1L, Some(5000000L), None, None)))
    val flat = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5L),
      (java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 5L))
      .toDF("ts", "v")
    val o2 = Stats.gumbelBlockMaxima(flat, "ts", "v")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect.head
    assert(o2 == ((2L, Some(5000000L), None, None)))
  }

  test("kruskalWallis matches the hand-computed no-tie case") {
    // a = {1,2}, b = {3,4}: ranks 1..4, R_a = 3, R_b = 7
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 17.4 − 15 = 2.4
    val df = Seq(("s", "a", 1L), ("s", "a", 2L),
      ("s", "b", 3L), ("s", "b", 4L)).toDF("st", "g", "v")
    val out = Stats.kruskalWallis(df, "st", "g", "v")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect.head
    assert(out._2 == 4L && out._3 == 2L)
    assert(out._4.contains(2400000L), out)
    // no ties → correction is identity
    assert(out._5.contains(2400000L), out)
  }

  test("kruskalWallis tie correction: a={1,1} b={2,2} → H=2.4, Hc=3.0") {
    // avg ranks 1.5,1.5,3.5,3.5 → same H as the no-tie case; tie_sum
    // = 2·(2³−2) = 12, C = 1 − 12/60 = 0.8 → H/C = 3.0
    val df = Seq(("s", "a", 1L), ("s", "a", 1L),
      ("s", "b", 2L), ("s", "b", 2L)).toDF("st", "g", "v")
    val out = Stats.kruskalWallis(df, "st", "g", "v")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect.head
    assert(out._4.contains(2400000L), out)
    assert(out._5.contains(3000000L), out)
  }

  test("kruskalWallis: single group gives NULL H") {
    val df = Seq(("s", "a", 1L), ("s", "a", 2L)).toDF("st", "g", "v")
    val out = Stats.kruskalWallis(df, "st", "g", "v")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect.head
    assert(out._4.isEmpty && out._5.isEmpty, out)
  }

  test("cliffsDelta: hand-computed dominance, separation, and overlap") {
    // a={3,4}, b={1,2}: all 4 pairs a>b → δ = 1
    // a={1,2}, b={1,2}: gt=1 (2>1), lt=1 (1<2), ties 2 → δ = 0
    val df = Seq(
      ("sep", "a", 3L), ("sep", "a", 4L), ("sep", "b", 1L), ("sep", "b", 2L),
      ("mix", "a", 1L), ("mix", "a", 2L), ("mix", "b", 1L), ("mix", "b", 2L))
      .toDF("st", "g", "v")
    val got = Stats.cliffsDelta(df, "st", "g", "a", "b", "v")
      .as[(String, Long, Long)].collect.map(r => r._1 -> r).toMap
    assert(got("sep") == (("sep", 1000000L, 4L)), got("sep"))
    assert(got("mix") == (("mix", 0L, 4L)), got("mix"))
    // partial: a={2,3}, b={1,3}: gt = 3 (2>1, 3>1 ... 2>1,3>1,3? 3>3 tie
    // → gt=2+... pairs: (2,1) gt, (2,3) lt, (3,1) gt, (3,3) tie →
    // δ = (2−1)/4 = 0.25
    val part = Seq(("p", "a", 2L), ("p", "a", 3L),
      ("p", "b", 1L), ("p", "b", 3L)).toDF("st", "g", "v")
    val got2 = Stats.cliffsDelta(part, "st", "g", "a", "b", "v")
      .as[(String, Long, Long)].collect.head
    assert(got2 == (("p", 250000L, 4L)), got2)
  }

  test("kendallTauB: perfect concordance, reversal, and tie-corrected " +
    "zero") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val got = Stats.kendallTauB(up, "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got == ((3L, 3L, 0L, Some(1000000L))), got)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val got2 = Stats.kendallTauB(down, "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got2 == ((3L, 0L, 3L, Some(-1000000L))), got2)
    // balanced 2x2 with ties on both margins: C = D = 1 → τ_b = 0
    val sq = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val got3 = Stats.kendallTauB(sq, "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got3 == ((4L, 1L, 1L, Some(0L))), got3)
    // a constant margin has no untied pairs → NULL τ
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    val got4 = Stats.kendallTauB(const, "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got4._4.isEmpty, got4)
  }

  test("cliffsDelta / kendallTauB: pre-bucket contract enforced — an " +
    "over-cap cell count fails fast with a clean error, not a BNLJ") {
    // 40 distinct values with maxCells=16 must raise BEFORE the
    // cells×cells join plans (the guard is a require, so the failure
    // is an IllegalArgumentException naming the fix)
    val wide = (1L to 40L).map(i => ("s", if (i % 2 == 0) "a" else "b", i))
      .toDF("st", "g", "v")
    val e1 = intercept[IllegalArgumentException] {
      Stats.cliffsDelta(wide, "st", "g", "a", "b", "v", maxCells = 16)
        .collect()
    }
    assert(e1.getMessage.contains("pre-bucket"), e1.getMessage)
    val xy = (1L to 40L).map(i => (i, i * 2)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] {
      Stats.kendallTauB(xy, "x", "y", maxCells = 16).collect()
    }
    assert(e2.getMessage.contains("pre-bucket"), e2.getMessage)
    // and the same shapes pass untouched under the default cap
    assert(Stats.cliffsDelta(wide, "st", "g", "a", "b", "v").count() == 1L)
    assert(Stats.kendallTauB(xy, "x", "y").count() == 1L)
  }

  test("rocAuc: hand-computed dominance with half-credit ties, " +
    "empty class gives NULL") {
    // pos {3, 2}, neg {1, 2}: gt = 3, eq = 1 → AUC = 3.5/4 = 0.875
    val df = Seq(("s", true, 3L), ("s", true, 2L),
      ("s", false, 1L), ("s", false, 2L)).toDF("st", "y", "v")
    val got = Stats.rocAuc(df, "st", "y", "v")
      .as[(String, Long, Long, Option[Long])].collect.head
    assert(got == (("s", 2L, 2L, Some(875000L))), got)
    // perfect separation → 1; reversed → 0
    val sep = Seq(("s", true, 9L), ("s", false, 1L)).toDF("st", "y", "v")
    assert(Stats.rocAuc(sep, "st", "y", "v")
      .as[(String, Long, Long, Option[Long])].collect.head._4
      == Some(1000000L))
    // one class empty → NULL auc
    val onecls = Seq(("s", true, 1L), ("s", true, 2L)).toDF("st", "y", "v")
    assert(Stats.rocAuc(onecls, "st", "y", "v")
      .as[(String, Long, Long, Option[Long])].collect.head._4.isEmpty)
  }

  test("cohensKappa: textbook 2x2 table, constant raters give NULL") {
    // [[20 yes-yes, 5 yes-no], [10 no-yes, 15 no-no]]:
    // po = 0.7, pe = (25·30 + 25·20)/2500 = 0.5 → κ = 0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val got = Stats.cohensKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Option[Long])].collect.head
    assert(got == ((50L, 35L, Some(400000L))), got)
    // both raters constant → pe = 1 → NULL
    val const = Seq(("y", "y"), ("y", "y")).toDF("a", "b")
    assert(Stats.cohensKappa(const, "a", "b")
      .as[(Long, Long, Option[Long])].collect.head._3.isEmpty)
  }

  test("fleissKappa: perfect agreement = 1, hand-computed mixed case, " +
    "unequal rater counts raise") {
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
      .toDF("item", "cat")
    val g1 = Stats.fleissKappa(perfect, "item", "cat")
      .as[(Long, Long, Option[Long])].collect.head
    assert(g1 == ((2L, 2L, Some(1000000L))), g1)
    // i1: A,A; i2: A,B → P̄ = 0.5, Pe = 0.625 → κ = −1/3
    val mixed = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val g2 = Stats.fleissKappa(mixed, "item", "cat")
      .as[(Long, Long, Option[Long])].collect.head
    assert(g2 == ((2L, 2L, Some(-333333L))), g2)
    val uneven = Seq((1L, "A"), (1L, "A"), (2L, "B")).toDF("item", "cat")
    val e = intercept[Exception] {
      Stats.fleissKappa(uneven, "item", "cat").collect()
    }
    assert(e.getMessage.contains("rater counts differ"), e.getMessage)
  }

  test("logRank: hand-computed two-subject case and symmetric null") {
    // A dies at 1 (n1=1,n2=1,d=1): E1 = .5, V = .25; B dies at 2
    // (n1=0): E1 = 0, V = 0 → O−E = .5, z = .5/√.25 = 1
    val df = Seq(("a", 1L, true), ("b", 2L, true)).toDF("g", "t", "e")
    val got = Stats.logRank(df, "g", "a", "b", "t", "e")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect.head
    assert(got == ((1L, 1L, 1L, 500000L, 250000L, Some(1000000L))), got)
    // identical groups → O = E exactly → z = 0
    val same = Seq(("a", 1L, true), ("b", 1L, true),
      ("a", 2L, true), ("b", 2L, true)).toDF("g", "t", "e")
    val z = Stats.logRank(same, "g", "a", "b", "t", "e")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect.head
    assert(z._6 == Some(0L), z)
    // censored rows enter at-risk but never the death counts
    val cens = Seq(("a", 1L, true), ("b", 2L, false)).toDF("g", "t", "e")
    val c = Stats.logRank(cens, "g", "a", "b", "t", "e")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect.head
    assert(c._3 == 1L && c._4 == 500000L, c)
  }

  test("brierDecomposition: hand-computed two-bin Murphy split") {
    // bin0: p̄ = .25, ō = .75 (4 rows); bin1: p̄ = .75, ō = .25 →
    // REL = .25, RES = .0625, UNC = .25, Brier = .4375
    val rows = Seq.fill(3)((250L, true)) ++ Seq((250L, false)) ++
      Seq.fill(3)((750L, false)) ++ Seq((750L, true))
    val got = Stats.brierDecomposition(rows.toDF("s", "y"), "s", "y",
      bins = 2, loMilli = 0L, hiMilli = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect.head
    assert(got == ((8L, 250000L, 62500L, 250000L, 437500L)), got)
  }

  test("krippendorffAlpha: perfect = 1, complete 2x2 disagreement = " +
    "−0.5, single-rating items drop") {
    val perfect = Seq((1L, "A"), (1L, "A"), (2L, "B"), (2L, "B"))
      .toDF("item", "cat")
    assert(Stats.krippendorffAlpha(perfect, "item", "cat")
      .as[(Long, Long, Option[Long])].collect.head
      == ((4L, 2L, Some(1000000L))))
    val disagree = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    assert(Stats.krippendorffAlpha(disagree, "item", "cat")
      .as[(Long, Long, Option[Long])].collect.head
      == ((4L, 2L, Some(-500000L))))
    // an un-pairable single-rating item contributes nothing
    val withSingle = perfect.unionByName(Seq((3L, "C")).toDF("item", "cat"))
    assert(Stats.krippendorffAlpha(withSingle, "item", "cat")
      .as[(Long, Long, Option[Long])].collect.head
      == ((4L, 2L, Some(1000000L))))
  }

  test("linCcc: identity = 1, pure shift penalized to 2/3, Pearson " +
    "would have said 1") {
    val id = Seq(("k", 0L, 0L), ("k", 2L, 2L)).toDF("k", "x", "y")
    assert(Stats.linCcc(id, "k", "x", "y")
      .as[(String, Long, Option[Long])].collect.head._3
      == Some(1000000L))
    // y = x + 1: vx = vy = 4, sxy num = 8, den = 4 + 4 + 4 → 2/3
    val shift = Seq(("k", 0L, 1L), ("k", 2L, 3L)).toDF("k", "x", "y")
    val got = Stats.linCcc(shift, "k", "x", "y")
      .as[(String, Long, Option[Long])].collect.head
    assert(got == (("k", 2L, Some(666667L))), got)
    val const = Seq(("k", 1L, 1L), ("k", 1L, 1L)).toDF("k", "x", "y")
    assert(Stats.linCcc(const, "k", "x", "y")
      .as[(String, Long, Option[Long])].collect.head._3.isEmpty)
  }

  test("hellingerByStratum and psiByStratum: identical distributions " +
    "→ 0, disjoint → H = 1") {
    val same = (1L to 4L).flatMap(v =>
      Seq(("s", "a", v), ("s", "b", v))).toDF("st", "g", "v")
    val h0 = Stats.hellingerByStratum(same, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Long)].collect.head
    assert(h0._4 == 1000000L && h0._5 == 0L, h0)
    assert(Stats.psiByStratum(same, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Long)].collect.head._5 == 0L)
    val disj = Seq(("s", "a", 1L), ("s", "a", 2L),
      ("s", "b", 8L), ("s", "b", 9L)).toDF("st", "g", "v")
    val h1 = Stats.hellingerByStratum(disj, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Long)].collect.head
    assert(h1._4 == 0L && h1._5 == 1000000L, h1)
    // PSI on disjoint support is large (rule of thumb: > 0.25)
    assert(Stats.psiByStratum(disj, "st", "g", "a", "b", "v")
      .as[(String, Long, Long, Long, Long)].collect.head._5 > 250000L)
  }

  test("partialCorrByKey: perfect xy survives any control, y ≡ z " +
    "degenerates to NULL partial") {
    // y = x: r_xy = 1; partial given z stays 1 (rxz = ryz cancel)
    val same = Seq((1L, 1L, 1L), (2L, 2L, 5L), (3L, 3L, 2L), (4L, 4L, 8L))
      .map { case (x, y, z) => ("k", x, y, z) }.toDF("k", "x", "y", "z")
    val got = Stats.partialCorrByKey(same, "k", "x", "y", "z")
      .as[(String, Long, Option[Long], Option[Long])].collect.head
    assert(got == (("k", 4L, Some(1000000L), Some(1000000L))), got)
    // y = z exactly: ryz = 1 → denominator 0 → NULL partial, r_xy kept
    val dup = Seq(("k", 1L, 1L, 1L), ("k", 2L, 3L, 3L), ("k", 3L, 2L, 2L))
      .toDF("k", "x", "y", "z")
    val got2 = Stats.partialCorrByKey(dup, "k", "x", "y", "z")
      .as[(String, Long, Option[Long], Option[Long])].collect.head
    assert(got2._3.nonEmpty && got2._4.isEmpty, got2)
    // hand-replayed general case via the identical formula
    val gen = Seq(("k", 1L, 1L, 1L), ("k", 2L, 3L, 1L),
      ("k", 3L, 2L, 2L), ("k", 4L, 4L, 2L)).toDF("k", "x", "y", "z")
    val r = Stats.partialCorrByKey(gen, "k", "x", "y", "z")
      .as[(String, Long, Option[Long], Option[Long])].collect.head
    def corr(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(a => a * a).sum)
      (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    }
    val (xs, ys, zs) = (Seq(1.0, 2, 3, 4), Seq(1.0, 3, 2, 4), Seq(1.0, 1, 2, 2))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val want = math.round((rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) * 1e6)
    assert(r._4 == Some(want), s"got ${r._4}, want $want")
  }

  test("cronbachAlpha: duplicate items give α = 1, hand case 2/3, " +
    "constant totals NULL, ragged matrix raises") {
    val dup = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (1L, "B", 1L), (2L, "B", 2L), (3L, "B", 3L)).toDF("s", "i", "v")
    val g1 = Stats.cronbachAlpha(dup, "s", "i", "v")
      .as[(Long, Long, Option[Long])].collect.head
    assert(g1 == ((3L, 2L, Some(1000000L))), g1)
    // A = [1,2,3], B = [1,3,2]: Σσᵢ²/σ_T² = 12/18 → α = 2(1/3) = 2/3
    val mix = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (1L, "B", 1L), (2L, "B", 3L), (3L, "B", 2L)).toDF("s", "i", "v")
    val g2 = Stats.cronbachAlpha(mix, "s", "i", "v")
      .as[(Long, Long, Option[Long])].collect.head
    assert(g2 == ((3L, 2L, Some(666667L))), g2)
    // anti-correlated items → constant totals → σ_T² = 0 → NULL
    val anti = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (1L, "B", 3L), (2L, "B", 2L), (3L, "B", 1L)).toDF("s", "i", "v")
    assert(Stats.cronbachAlpha(anti, "s", "i", "v")
      .as[(Long, Long, Option[Long])].collect.head._3.isEmpty)
    val ragged = Seq((1L, "A", 1L), (1L, "B", 2L), (2L, "A", 1L))
      .toDF("s", "i", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.cronbachAlpha(ragged, "s", "i", "v")
    }
    assert(e.getMessage.contains("every subject"), e.getMessage)
    // round-10 fix: DISJOINT item sets pass the per-subject counts
    // (each subject answers 2 items) but must still raise — the item
    // universe is 4 ≠ k = 2
    val disjoint = Seq((1L, "A", 1L), (1L, "B", 2L),
      (2L, "C", 1L), (2L, "D", 2L)).toDF("s", "i", "v")
    val e2 = intercept[IllegalArgumentException] {
      Stats.cronbachAlpha(disjoint, "s", "i", "v")
    }
    assert(e2.getMessage.contains("DIFFERENT item sets"), e2.getMessage)
    // overlapping-but-unequal sets with equal per-subject and global
    // counts: A,B / A,C / B,C over 3 subjects — global items = 3 ≠ 2
    val overlap = Seq((1L, "A", 1L), (1L, "B", 2L), (2L, "A", 1L),
      (2L, "C", 2L), (3L, "B", 1L), (3L, "C", 2L)).toDF("s", "i", "v")
    val e3 = intercept[IllegalArgumentException] {
      Stats.cronbachAlpha(overlap, "s", "i", "v")
    }
    assert(e3.getMessage.contains("DIFFERENT item sets"), e3.getMessage)
  }

  test("friedman: textbook untied case Q = 6, all-tied gives NULL, " +
    "unequal blocks raise") {
    // 3 blocks, 3 treatments, consistent order A<B<C in every block:
    // Q = 12·Σ(R_j − n(k+1)/2)²/(nk(k+1)) = 12·18/36 = 6
    val df = (1L to 3L).flatMap(b => Seq(
      (b, "A", b * 10L + 1), (b, "B", b * 10L + 2), (b, "C", b * 10L + 3)))
      .toDF("b", "tr", "v")
    val got = Stats.friedman(df, "b", "tr", "v")
      .as[(Long, Long, Option[Long])].collect.head
    assert(got == ((3L, 3L, Some(6000000L))), got)
    // every block fully tied → zero rank variance → NULL
    val tied = (1L to 3L).flatMap(b => Seq(
      (b, "A", 7L), (b, "B", 7L), (b, "C", 7L))).toDF("b", "tr", "v")
    assert(Stats.friedman(tied, "b", "tr", "v")
      .as[(Long, Long, Option[Long])].collect.head._3.isEmpty)
    // a block missing a treatment raises
    val uneven = Seq((1L, "A", 1L), (1L, "B", 2L), (2L, "A", 1L))
      .toDF("b", "tr", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.friedman(uneven, "b", "tr", "v").collect()
    }
    assert(e.getMessage.contains("block sizes differ"), e.getMessage)
  }

  test("mantelHaenszel: single stratum equals the plain odds ratio; " +
    "S = 0 gives NULL") {
    // [[10, 5], [2, 8]]: OR = (10·8/25)/(5·2/25) = 8
    val rows = Seq.fill(10)((1, true, true)) ++ Seq.fill(5)((1, true, false)) ++
      Seq.fill(2)((1, false, true)) ++ Seq.fill(8)((1, false, false))
    val got = Stats.mantelHaenszel(rows.toDF("st", "x", "y"), "st", "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got == ((1L, 3200000L, 400000L, Some(8000000L))), got)
    // no discordant b·c mass anywhere → S = 0 → NULL
    val nodisc = Seq((1, true, true), (1, false, false)).toDF("st", "x", "y")
    assert(Stats.mantelHaenszel(nodisc, "st", "x", "y")
      .as[(Long, Long, Long, Option[Long])].collect.head._4.isEmpty)
  }

  test("conformalThreshold: hand-computed k = ceil((n+1)(1-α)), " +
    "tie-proof value-cell selection") {
    // {1..10}, α=0.2: k = ceil(11·0.8) = 9 → threshold 9
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val out = Stats.conformalThreshold(df, "g", "v", alphaPpm = 200000L)
      .as[(String, Long, Long, Long)].collect.head
    assert(out == (("g", 10L, 9L, 9L)), out)
    // ties: {1,1,1,2}, α=0.25: k = ceil(5·0.75) = 4 → threshold 2
    val ties = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L))
      .toDF("g", "v")
    val out2 = Stats.conformalThreshold(ties, "g", "v", 250000L)
      .as[(String, Long, Long, Long)].collect.head
    assert(out2 == (("g", 4L, 4L, 2L)), out2)
    // k clamps to n on tiny groups
    val one = Seq(("g", 5L)).toDF("g", "v")
    val out3 = Stats.conformalThreshold(one, "g", "v", 500000L)
      .as[(String, Long, Long, Long)].collect.head
    assert(out3 == (("g", 1L, 1L, 5L)), out3)
  }

  test("nelsonAalen: hand-computed hazard accumulation with censoring") {
    // durations (1,e),(2,e),(2,cens),(3,e): at-risk 4,3,1 at t=1,2,3
    // → terms 250000, 333333, 1000000 → H = 250000, 583333, 1583333
    val df = Seq(("k", 1L, true), ("k", 2L, true), ("k", 2L, false),
      ("k", 3L, true)).toDF("k", "t", "e")
    val out = Stats.nelsonAalen(df, "k", "t", "e")
      .as[(String, Long, Long, Long, Long)].collect
      .sortBy(_._2).toSeq
    assert(out == Seq(("k", 1L, 4L, 1L, 250000L),
      ("k", 2L, 3L, 1L, 583333L), ("k", 3L, 1L, 1L, 1583333L)), out)
  }

  test("bhFdr: hand-computed step-up — k* cuts after the largest " +
    "passing rank, step-up rescues larger p-values") {
    val df = Seq(("A", 10000L), ("B", 30000L), ("C", 200000L),
      ("D", 500000L), ("E", 900000L)).toDF("t", "p")
    // thresholds k·α/m = k·50000: ranks 1,2 pass; 3,4,5 fail → k*=2
    val got = Stats.bhFdr(df, "t", "p", alphaMicro = 250000L)
      .as[(String, Long, Long, Boolean)].collect
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("A" -> true, "B" -> true, "C" -> false,
      "D" -> false, "E" -> false), got)
    // step-up: rank 3 passes (140000 ≤ 150000) so EVERYTHING below
    // rejects even though rank 2 alone would too
    val up = Seq(("A", 40000L), ("B", 90000L), ("C", 140000L))
      .toDF("t", "p")
    val got2 = Stats.bhFdr(up, "t", "p", alphaMicro = 150000L)
      .as[(String, Long, Long, Boolean)].collect.map(_._4).toSeq
    assert(got2 == Seq(true, true, true), got2)
  }

  test("cochranArmitage matches the hand-computed two-dose case") {
    // dose 0: 0/2 successes, dose 1: 2/2. T = 1·(2·4 − 2·2) = 4;
    // var = 0.5·0.5·4·(4·2 − 2²) = 4 → z = 2.0
    val df = Seq((0L, false), (0L, false), (1L, true), (1L, true))
      .toDF("dose", "s")
    val out = Stats.cochranArmitage(df, "dose", "s")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(out == ((4L, 2L, 4L, Some(2000000L))), out)
    // zero-variance (all successes) → NULL z
    val flat = Seq((0L, true), (1L, true)).toDF("dose", "s")
    val out2 = Stats.cochranArmitage(flat, "dose", "s")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(out2._4.isEmpty, out2)
  }

  test("jarqueBera matches the hand-computed uniform case") {
    // {1,2,3,4}: m2 = 1.25, m3 = 0, m4 = 2.5625 → skew 0,
    // kurt = 1.64, JB = 4/6 · 0.25 · 1.36² = 0.3082667
    val df = Seq(("k", 1L), ("k", 2L), ("k", 3L), ("k", 4L))
      .toDF("key", "v")
    val out = Stats.jarqueBera(df, "key", "v")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect.head
    assert(out._2 == 4L)
    assert(out._3.contains(0L), out)
    assert(out._4.contains(1640000L), out)
    assert(out._5.contains(308267L), out)
  }

  test("jarqueBera: zero variance and n<2 give NULL micros") {
    val df = Seq(("flat", 7L), ("flat", 7L), ("one", 3L))
      .toDF("key", "v")
    val out = Stats.jarqueBera(df, "key", "v")
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect.map(r => r._1 -> r).toMap
    assert(out("flat")._3.isEmpty && out("flat")._5.isEmpty)
    assert(out("one")._3.isEmpty && out("one")._5.isEmpty)
  }
}
