package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-6 analytics additions: rank/robust statistics, sweep-line
  * concurrency, changepoints, privacy audits, bitmap indexes, and the
  * portable stemmer. Each test pins a hand-computed ground truth. */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // --- spearmanByKey ------------------------------------------------------

  test("spearmanByKey: perfect monotone = 1e6, anti-monotone = -1e6") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L), ("up", 4L, 99L),
      ("dn", 1L, 9L), ("dn", 2L, 8L), ("dn", 3L, 7L))
      .toDF("k", "x", "y")
    val m = Stats.spearmanByKey(df, "k", "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m("up") == 1000000L && m("dn") == -1000000L)
  }

  test("spearmanByKey: ties get average ranks (hand case)") {
    // x: 1,2,2,4 → ranks 1, 2.5, 2.5, 4; y: 10,20,20,40 → same ranks
    // → rho = 1 exactly even with ties
    val df = Seq(("t", 1L, 10L), ("t", 2L, 20L), ("t", 2L, 20L),
      ("t", 4L, 40L)).toDF("k", "x", "y")
    val rho = Stats.spearmanByKey(df, "k", "x", "y")
      .collect().head.getLong(2)
    assert(rho == 1000000L)
  }

  test("spearmanByKey: constant axis → NULL, n<2 → NULL") {
    val df = Seq(("c", 5L, 1L), ("c", 5L, 2L), ("one", 1L, 1L))
      .toDF("k", "x", "y")
    val out = Stats.spearmanByKey(df, "k", "x", "y")
      .collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(out("c") && out("one"))
  }

  // --- theilSenDaily ------------------------------------------------------

  test("theilSenDaily: outlier day does not drag the median slope") {
    // key a: days 0..4 counts 1,2,3,4,1000 — OLS would explode; the
    // 10 pairwise slopes (×1e6): five pairs among 1..4 give 1e6 each
    // (slope exactly 1), pairs with day4: (1000-1)/4, (1000-2)/3,
    // (1000-3)/2, (1000-4)/1 — all huge. Sorted asc: 1e6 ×6? no:
    // slopes: d(0,1)=1,d(0,2)=1,d(0,3)=1,d(1,2)=1,d(1,3)=1,d(2,3)=1 →
    // six 1e6 slopes, four huge → lower median (pos 5 of 10) = 1e6.
    val rows = for {
      (d, c) <- Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 1000))
      i <- 1 to c
    } yield ("a", ts(f"2024-01-0$d%d 00:00:00"))
    val df = rows.toDF("k", "t")
    val out = Stats.theilSenDaily(df, "k", "t").collect().head
    assert(out.getLong(1) == 5L)       // n_days
    assert(out.getLong(2) == 10L)      // n_pairs
    assert(out.getLong(3) == 1000000L) // slope_micro robust to the spike
  }

  test("theilSenDaily: single-day key drops (no pair)") {
    val df = Seq(("solo", ts("2024-01-01 00:00:00"))).toDF("k", "t")
    assert(Stats.theilSenDaily(df, "k", "t").count() == 0)
  }

  // --- isotonicFit --------------------------------------------------------

  test("isotonicFit: PAVA pools a violating middle bin") {
    // bins (v in milli, bins=4 over [0,4000)): rates 0/2, 2/2, 1/2, 2/2
    // → violation at bin2 (0.5 after 1.0): pool bins 1-2 → 3/4 = 0.75
    // fit: 0, 0.75, 0.75, 1.0
    val rows =
      Seq((500L, false), (500L, false),
        (1500L, true), (1500L, true),
        (2500L, true), (2500L, false),
        (3500L, true), (3500L, true))
    val df = rows.toDF("v", "y")
    val out = Stats.isotonicFit(df, "v", "y", bins = 4, loMilli = 0L,
      hiMilli = 4000L)
      .orderBy("bin")
      .select("bin", "n", "pos", "iso_micro")
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(out == Seq((0L, 2L, 0L, 0L), (1L, 2L, 2L, 750000L),
      (2L, 2L, 1L, 750000L), (3L, 2L, 2L, 1000000L)))
  }

  test("isotonicFit: already-monotone rates pass through unchanged") {
    val rows = Seq((500L, false), (1500L, true), (1500L, false),
      (2500L, true))
    val out = Stats.isotonicFit(rows.toDF("v", "y"), "v", "y", bins = 4,
      loMilli = 0L, hiMilli = 4000L)
      .orderBy("bin").select("iso_micro").as[Long].collect.toSeq
    assert(out == Seq(0L, 500000L, 1000000L))
  }

  // --- dpNoisyCounts ------------------------------------------------------

  test("dpNoisyCounts: noise bounded, deterministic, clamped at zero") {
    val df = (1 to 40).map(i => s"k${i % 4}").toDF("k")
    val out = Stats.dpNoisyCounts(df, "k", bound = 3, seed = 7L)
      .as[(String, Long, Long, Long)].collect.toSeq.sortBy(_._1)
    assert(out.map(_._2).sum == 40)
    assert(out.forall { case (_, n, noise, noisy) =>
      noise >= -3 && noise <= 3 && noisy == math.max(n + noise, 0L) })
    val again = Stats.dpNoisyCounts(df, "k", bound = 3, seed = 7L)
      .as[(String, Long, Long, Long)].collect.toSeq.sortBy(_._1)
    assert(out == again)
    // a tiny key with a big bound can clamp
    val tiny = Stats.dpNoisyCounts(Seq("x").toDF("k"), "k",
      bound = 100, seed = 1L).collect().head
    assert(tiny.getLong(3) >= 0)
  }

  // --- kAnonymity ---------------------------------------------------------

  test("kAnonymity flags small classes and low sensitive diversity") {
    val df = Seq(
      // class (10, "a"): 3 rows, 3 distinct sensitives → safe at k=3,l=3
      (10L, "a", 1L), (10L, "a", 2L), (10L, "a", 3L),
      // class (10, "b"): 2 rows → risky_k at k=3
      (10L, "b", 1L), (10L, "b", 2L),
      // class (20, "a"): 3 rows but 1 distinct sensitive → risky_l at l=3
      (20L, "a", 9L), (20L, "a", 9L), (20L, "a", 9L))
      .toDF("zip", "seg", "s")
    val out = KeyChecks.kAnonymity(df, Seq("zip", "seg"), "s", k = 3, l = 3)
      .orderBy("zip", "seg")
      .as[(Long, String, Long, Long, Boolean, Boolean)].collect.toSeq
    assert(out == Seq(
      (10L, "a", 3L, 3L, false, false),
      (10L, "b", 2L, 2L, true, true),
      (20L, "a", 3L, 1L, false, true)))
  }

  // --- maxConcurrent ------------------------------------------------------

  test("maxConcurrent: half-open touch does not overlap; nesting counts") {
    val df = Seq(
      // k1: [0,10) [10,20) touch → peak 1; [5,8) nests? no — with
      // [0,10): [0,10) and [5,8) overlap → peak 2
      ("k1", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:10")),
      ("k1", ts("2024-01-01 00:00:10"), ts("2024-01-01 00:00:20")),
      ("k1", ts("2024-01-01 00:00:05"), ts("2024-01-01 00:00:08")),
      // k2: three fully nested → peak 3
      ("k2", ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00")),
      ("k2", ts("2024-01-01 00:00:10"), ts("2024-01-01 00:00:50")),
      ("k2", ts("2024-01-01 00:00:20"), ts("2024-01-01 00:00:40")))
      .toDF("k", "s", "e")
    val m = TimeSeries.maxConcurrent(df, "k", "s", "e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("k1") == ((3L, 2L)))
    assert(m("k2") == ((3L, 3L)))
  }

  test("maxConcurrent: two-phase peak equals the single-window ground truth") {
    // randomized-ish deterministic pile of intervals; compare against
    // a plain global-window sweep computed with a different plan
    val base = ts("2024-01-01 00:00:00").getTime
    val rows = (0 until 200).map { i =>
      val s = (i * 37) % 500
      ("hot", new Timestamp(base + s * 1000L),
        new Timestamp(base + (s + 13 + i % 11) * 1000L))
    }
    val df = rows.toDF("k", "s", "e")
    val got = TimeSeries.maxConcurrent(df, "k", "s", "e")
      .collect().head.getLong(2)
    // oracle: explicit event sort in local scala
    val evs = rows.flatMap { case (_, s, e) =>
      Seq((s.getTime, 1), (e.getTime, -1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L; var peak = 0L
    evs.foreach { case (_, d) => run += d; peak = math.max(peak, run) }
    assert(got == peak)
  }

  // --- cusumChangepoint ---------------------------------------------------

  test("cusumChangepoint finds a level shift at its last low day") {
    // 3 days at 10 then 3 days at 100: |S| peaks at the boundary
    val rows = for {
      (d, c) <- Seq((1, 10), (2, 10), (3, 10), (4, 100), (5, 100), (6, 100))
      i <- 1 to c
    } yield ("a", ts(f"2024-02-0$d%d 12:00:00"))
    val out = TimeSeries.cusumChangepoint(rows.toDF("k", "t"), "k", "t")
      .collect().head
    assert(out.getLong(1) == 6L && out.getLong(2) == 330L)
    assert(out.getDate(3).toString == "2024-02-03")
    // S_3 = P_3·D − 3·T = 30·6 − 3·330 = 180 − 990 = −810 → |S| = 810
    assert(out.getLong(4) == 810L)
  }

  test("cusumChangepoint: flat series reports first day with S=0") {
    val rows = for { d <- 1 to 4; _ <- 1 to 7 }
      yield ("flat", ts(f"2024-03-0$d%d 00:00:00"))
    val out = TimeSeries.cusumChangepoint(rows.toDF("k", "t"), "k", "t")
      .collect().head
    assert(out.getDate(3).toString == "2024-03-01" && out.getLong(4) == 0L)
  }

  // --- rollingSlope -------------------------------------------------------

  test("rollingSlope: exact slope on a linear daily grid") {
    import java.sql.Date
    val rows = (0 until 10).map(i =>
      ("a", Date.valueOf(f"2024-01-${i + 1}%02d"), 100L + 7L * i))
    val out = TimeSeries.rollingSlope(rows.toDF("k", "d", "v"),
      "k", "d", "v", days = 4)
      .orderBy("d").select("slope_micro").as[Option[Long]].collect.toSeq
    assert(out.head.isEmpty)                    // first row: n = 1
    assert(out.tail.forall(_.contains(7000000L))) // slope exactly 7
  }

  // --- precedencePairs ----------------------------------------------------

  test("precedencePairs: span collapse matches the quadratic truth") {
    val df = Seq(
      // u1: a@1, b@2, a@3 → a<b (1<2), b<a (2<3), both hold
      (1L, "a", ts("2024-01-01 00:00:01")),
      (1L, "b", ts("2024-01-01 00:00:02")),
      (1L, "a", ts("2024-01-01 00:00:03")),
      // u2: a@5, b@4 → only b<a
      (2L, "a", ts("2024-01-01 00:00:05")),
      (2L, "b", ts("2024-01-01 00:00:04")),
      // u3: a and b simultaneous → neither (strict <)
      (3L, "a", ts("2024-01-01 00:00:09")),
      (3L, "b", ts("2024-01-01 00:00:09")))
      .toDF("u", "t", "ts")
    val out = Sequences.precedencePairs(df, "u", "t", "ts", minSupport = 1L)
      .as[(String, String, Long)].collect.toSet
    assert(out == Set(("a", "b", 1L), ("b", "a", 2L)))
  }

  // --- bitmapIndex --------------------------------------------------------

  test("bitmapIndex packs 32-bit words with exact popcounts") {
    val df = Seq((0L, "x"), (1L, "x"), (31L, "x"), (32L, "x"), (33L, "y"),
      (-5L, "x"), (4L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val out = InvertedIndex.bitmapIndex(df, "id", "v")
      .orderBy("value", "word_idx")
      .as[(String, Long, Long, Long)].collect.toSeq
    // x word0: bits 0,1,31 → 1 + 2 + 2^31; x word1: bit 0 → 1
    assert(out == Seq(
      ("x", 0L, 1L + 2L + (1L << 31), 3L),
      ("x", 1L, 1L, 1L),
      ("y", 1L, 2L, 1L)))
  }

  // --- stemLite / stemmedTopTerms ----------------------------------------

  test("stemLite rule chain on canonical forms") {
    val df = Seq("classes", "studies", "class", "dogs", "gas", "running",
      "jumped", "quickly", "red", "sing").toDF("w")
    val got = df.select(TextAnalytics.stemLite(col("w")).as("s"))
      .as[String].collect.toSeq
    assert(got == Seq("class", "studi", "class", "dog", "gas", "runn",
      "jump", "quick", "red", "sing"))
  }

  test("stemmedTopTerms merges plural and edge-punctuated variants") {
    val df = Seq("the cats sat", "A cat, sat!", "cats cats").toDF("text")
    val out = TextAnalytics.stemmedTopTerms(df, "text", 10)
      .as[(String, Long)].collect.toSeq
    assert(out.head == (("cat", 4L)))
    assert(out.contains(("sat", 2L)))
  }

  // --- mannKendallDaily ---------------------------------------------------

  test("mannKendallDaily: monotone series → tau = ±1; flat → 0") {
    val rows =
      (for { (d, c) <- Seq((1, 1), (2, 2), (3, 3), (4, 4)); _ <- 1 to c }
        yield ("up", ts(f"2024-01-0$d%d 00:00:00"))) ++
      (for { (d, c) <- Seq((1, 9), (2, 6), (3, 3)); _ <- 1 to c }
        yield ("dn", ts(f"2024-01-0$d%d 00:00:00"))) ++
      (for { d <- 1 to 3; _ <- 1 to 5 }
        yield ("fl", ts(f"2024-01-0$d%d 00:00:00")))
    val m = Stats.mannKendallDaily(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("up") == ((6L, 6L, 1000000L)))   // all 6 pairs concordant
    assert(m("dn") == ((3L, -3L, -1000000L)))
    assert(m("fl") == ((3L, 0L, 0L)))
  }

  // --- seasonalProfile ----------------------------------------------------

  test("seasonalProfile: arithmetic dow and exact indexes") {
    // 2024-01-07 is a Sunday (epoch day 19729; (19729+4)%7 = 0)
    val rows =
      (for (_ <- 1 to 10) yield ("a", ts("2024-01-07 09:00:00"))) ++ // Sun
      (for (_ <- 1 to 30) yield ("a", ts("2024-01-08 09:00:00"))) ++ // Mon
      (for (_ <- 1 to 20) yield ("a", ts("2024-01-14 09:00:00")))    // Sun
    val out = TimeSeries.seasonalProfile(rows.toDF("k", "t"), "k", "t")
      .orderBy("dow")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    // Sunday: 2 days, 30 total → mean 15; Monday: 1 day, 30 → mean 30
    // overall mean = 60/3 = 20 → indexes 0.75 and 1.5
    assert(out == Seq(("a", 0L, 2L, 15000000L, 750000L),
      ("a", 1L, 1L, 30000000L, 1500000L)))
  }

  // --- bootstrapMeans -----------------------------------------------------

  test("bootstrapMeans: deterministic, replicates vary, weights Poisson-ish") {
    val df = (1 to 500).map(i => ("k", i.toLong, 1000L + (i % 7)))
      .toDF("k", "id", "v")
    val out = Stats.bootstrapMeans(df, "k", "id", "v", reps = 8, seed = 3L)
      .orderBy("b")
      .as[(String, Long, Long, Option[Long])].collect.toSeq
    assert(out.size == 8 && out.map(_._2) == (0L to 7L))
    // Poisson(1) weights: n_eff concentrates near n = 500
    assert(out.forall { case (_, _, ne, m) =>
      ne > 350 && ne < 650 && m.exists(v => v > 1000000L && v < 1010000L) })
    // replicate means are not all identical (the spread IS the point)
    assert(out.map(_._4).distinct.size > 1)
    val again = Stats.bootstrapMeans(df, "k", "id", "v", reps = 8, seed = 3L)
      .orderBy("b")
      .as[(String, Long, Long, Option[Long])].collect.toSeq
    assert(out == again)
  }

  // --- bitmapAlgebra / bitmapDistinct ------------------------------------

  test("bitmapAlgebra: AND/OR/Jaccard across word boundaries") {
    // x = {0, 40}, y = {0, 40, 80}, z = {200} (disjoint from both)
    val df = Seq((0L, "x"), (40L, "x"), (0L, "y"), (40L, "y"), (80L, "y"),
      (200L, "z")).toDF("id", "v")
    val out = InvertedIndex.bitmapAlgebra(
      InvertedIndex.bitmapIndex(df, "id", "v"))
      .orderBy("value_a", "value_b")
      .as[(String, String, Long, Long, Option[Long])].collect.toSeq
    assert(out == Seq(
      ("x", "y", 2L, 3L, Some(666666L)),
      ("x", "z", 0L, 3L, Some(0L)),
      ("y", "z", 0L, 4L, Some(0L))))
  }

  test("bitmapDistinct equals count_distinct") {
    val df = Seq((1L, "a"), (1L, "a"), (33L, "a"), (64L, "a"),
      (1L, "b"), (1L, "b")).toDF("id", "k")
    val out = InvertedIndex.bitmapDistinct(df, "k", "id")
      .as[(String, Long)].collect.toMap
    assert(out == Map("a" -> 3L, "b" -> 1L))
  }

  // --- slidingDistinct ----------------------------------------------------

  test("slidingDistinct: range-delta equals brute-force windowed distinct") {
    // deterministic scatter of (key, user, day) occurrences with
    // repeats inside and across windows
    val rows = for {
      k <- Seq("a", "b"); i <- 0 until 60
    } yield (k, (i * 7 + (if (k == "a") 3 else 5)) % 11,
      ts(f"2024-01-${(i * 13) % 28 + 1}%02d 06:00:00"))
    val df = rows.toDF("k", "u", "t")
    val got = TimeSeries.slidingDistinct(df, "k", "u", "t", days = 7)
      .as[(String, Long, Long)].collect.toSeq.sorted
    // brute force in scala
    val occ = rows.map { case (k, u, t) =>
      (k, u, t.toLocalDateTime.toLocalDate.toEpochDay) }.distinct
    val (mn, mx) = (occ.map(_._3).min, occ.map(_._3).max)
    val expect = (for {
      k <- Seq("a", "b"); d <- mn to mx
    } yield (k, d,
      occ.filter(o => o._1 == k && o._3 >= d - 6 && o._3 <= d)
        .map(_._2).distinct.size.toLong)).sorted
    assert(got == expect)
  }

  // --- hodgesLehmannDaily -------------------------------------------------

  test("hodgesLehmannDaily: hand case with an outlier day") {
    // days 1..4 counts 1,2,3,10: walsh doubled sums (i<=j):
    // 2,3,4,11, 4,5,12, 6,13, 20 → sorted: 2,3,4,4,5,6,11,12,13,20
    // lower median pos (10+1)//2=5 → 5 → hl = 2.5 → 2500000 micro
    val rows = for {
      (d, c) <- Seq((1, 1), (2, 2), (3, 3), (4, 10)); _ <- 1 to c
    } yield ("a", ts(f"2024-01-0$d%d 00:00:00"))
    val out = Stats.hodgesLehmannDaily(rows.toDF("k", "t"), "k", "t")
      .collect().head
    assert(out.getLong(1) == 4L && out.getLong(2) == 10L)
    assert(out.getLong(3) == 2500000L)
  }

  // --- degreeDistribution -------------------------------------------------

  test("degreeDistribution: histogram, ccdf, and CSN alpha") {
    // star: center 0 with leaves 1..4 → center degree 4, leaves 1
    val edges = (1L to 4L).map(i => (0L, i)).toDF("u", "v")
    val out = Graph.degreeDistribution(edges, "u", "v")
      .orderBy("degree")
      .as[(Long, Long, Long, Long)].collect.toSeq
    // hist: degree 1 ×4, degree 4 ×1; ccdf: ge(1)=5, ge(4)=1
    assert(out.map(t => (t._1, t._2, t._3)) == Seq((1L, 4L, 5L), (4L, 1L, 1L)))
    // alpha = 1 + 5 / (4·ln2 + ln8) with micro-quantized logs
    val slog = 4 * math.round(math.log(1 / 0.5) * 1e6) +
      math.round(math.log(4 / 0.5) * 1e6)
    val alpha = math.round(1e6 + 5.0 * 1e12 / slog)
    assert(out.forall(_._4 == alpha))
  }

  // --- quantilesPerKey ----------------------------------------------------

  test("quantilesPerKey: exact type-1 picks with ties") {
    // key a: 1,2,2,2,10 (n=5): p50 rank ⌈2.5⌉=3 → 2; p90 rank 5 → 10;
    // p0 clamps to rank 1 → 1
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 2L), ("a", 10L))
      .toDF("k", "x")
    val out = Stats.quantilesPerKey(df, "k", "x",
      Seq(0L, 500000L, 900000L, 1000000L))
      .orderBy("p_micro")
      .as[(String, Long, Long)].collect.toSeq
    assert(out == Seq(("a", 0L, 1L), ("a", 500000L, 2L),
      ("a", 900000L, 10L), ("a", 1000000L, 10L)))
  }

  // --- hhiByKey -----------------------------------------------------------

  test("hhiByKey: monopoly = 1e6, equal shares = 1e6/n") {
    val df = Seq(("mono", 7L), ("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("eq", 5L)).toDF("k", "x")
    val out = Stats.hhiByKey(df, "k", "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("mono") == 1000000L && out("eq") == 250000L)
  }

  // --- cmsJoinSize --------------------------------------------------------

  test("cmsJoinSize: collision-free estimate equals the true join size") {
    // A: apple×3, pear×2; B: apple×4, plum×5 → true Σ fA·fB = 12;
    // 1024-wide rows over 3 tokens → no collisions → every dot = 12
    val a = TextAnalytics.countMinSketch(
      Seq("apple apple apple pear pear").toDF("text"), "text",
      d = 4, width = 1024)
    val b = TextAnalytics.countMinSketch(
      Seq("apple apple apple apple plum plum plum plum plum").toDF("text"),
      "text", d = 4, width = 1024)
    val out = TextAnalytics.cmsJoinSize(a, b, d = 4)
      .orderBy("row")
      .as[(Long, Long, Long)].collect.toSeq
    assert(out.size == 4)
    assert(out.forall { case (_, dot, est) => dot == 12L && est == 12L })
  }

  test("cmsJoinSize: disjoint vocabularies estimate zero") {
    val a = TextAnalytics.countMinSketch(Seq("aa bb").toDF("text"), "text")
    val b = TextAnalytics.countMinSketch(Seq("cc dd").toDF("text"), "text")
    val est = TextAnalytics.cmsJoinSize(a, b)
      .select("join_size_est").as[Long].head()
    assert(est == 0L)
  }

  // --- madOutliersPerKey --------------------------------------------------

  test("madOutliersPerKey: hand case and MAD-zero degenerate") {
    // key a: 1,2,3,4,100 → median 3 (rank ⌈2.5⌉), devs 2,1,0,1,97 →
    // MAD = 1 (sorted 0,1,1,2,97, rank 3), outliers: dev > 3 → {97}
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      // key z: 5,5,5,9 → median 5, devs 0,0,0,4 → MAD 0 → dev>0 outlier
      ("z", 5L), ("z", 5L), ("z", 5L), ("z", 9L))
      .toDF("k", "x")
    val out = Stats.madOutliersPerKey(df, "k", "x", k = 3L)
      .orderBy("key")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    assert(out == Seq(("a", 5L, 3L, 1L, 1L), ("z", 4L, 5L, 0L, 1L)))
  }

  // --- HistStore.estimateRange --------------------------------------------

  test("estimateRange: exact on bin edges, interpolated mid-bin") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("selest").toString
    // key a: 10 values in bin 0 ([0,100)), 30 in bin 1 ([100,200))
    val df = ((1 to 10).map(i => ("a", 50L)) ++
      (1 to 30).map(i => ("a", 150L))).toDF("k", "v")
    HistStore.write(df, "k", "v", tmp, lo = 0L, width = 100L, bins = 4)
    // full-domain query → everything
    val full = HistStore.estimateRange(s, tmp, 0L, 400L)
      .collect().head
    assert(full.getLong(1) == 40L && full.getLong(2) == 40L)
    // [100, 150): half of bin 1 → 30·50 div 100 = 15
    val half = HistStore.estimateRange(s, tmp, 100L, 150L)
      .collect().head.getLong(2)
    assert(half == 15L)
    // [75, 125): quarter of bin 0 + quarter of bin 1 → 2 + 7 = 9
    val straddle = HistStore.estimateRange(s, tmp, 75L, 125L)
      .collect().head.getLong(2)
    assert(straddle == (10L * 25 / 100) + (30L * 25 / 100))
  }

  // --- ruleAudit ----------------------------------------------------------

  test("ruleAudit: NULL predicates are violations; one scan, ordered rows") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (-3L, None))
      .toDF("id", "tag")
    val out = KeyChecks.ruleAudit(df, Seq(
      "id_positive" -> (col("id") > 0),
      "tag_is_a" -> (col("tag") === "a"),   // NULL tag → violation
      "always" -> lit(true)))
      .as[(String, Long, Long, Long)].collect.toSeq
    assert(out == Seq(
      ("id_positive", 3L, 1L, 333333L),
      ("tag_is_a", 3L, 2L, 666666L),
      ("always", 3L, 0L, 0L)))
  }

  test("ruleAudit: empty input yields zero rows audited, no NPE") {
    val df = Seq((1L, "a")).toDF("id", "tag").where(lit(false))
    val out = KeyChecks.ruleAudit(df, Seq("id_positive" -> (col("id") > 0)))
      .as[(String, Long, Long, Long)].collect.toSeq
    assert(out == Seq(("id_positive", 0L, 0L, 0L)))
  }

  // --- timeToConvert ------------------------------------------------------

  test("timeToConvert: first exposure to first qualifying conversion") {
    val df = Seq(
      // u1: view@10, purchase@40 → 30s; later purchase ignored
      (1L, "view", ts("2024-01-01 00:00:10")),
      (1L, "purchase", ts("2024-01-01 00:00:40")),
      (1L, "purchase", ts("2024-01-01 00:01:40")),
      // u2: purchase BEFORE first view → only the later one counts
      (2L, "purchase", ts("2024-01-01 00:00:05")),
      (2L, "view", ts("2024-01-01 00:00:20")),
      (2L, "purchase", ts("2024-01-01 00:00:50")),
      // u3: view only → no row
      (3L, "view", ts("2024-01-01 00:00:00")))
      .toDF("u", "et", "ts")
    val out = Sequences.timeToConvert(df, "u", "ts", "et",
      "view", "purchase")
      .as[(Long, Long)].collect.toMap
    assert(out == Map(1L -> 30L, 2L -> 30L))
  }

  // --- kaplanMeier --------------------------------------------------------

  test("kaplanMeier: censoring shrinks risk sets without forcing events") {
    // t=1 event, t=2 censored, t=3 event ×2, t=4 censored:
    // S(1) = 4/5, S(3) = 4/5 · 1/3 (risk set at 3 is {3,3,4})
    val df = Seq(("k", 1L, true), ("k", 2L, false), ("k", 3L, true),
      ("k", 3L, true), ("k", 4L, false)).toDF("g", "t", "e")
    val out = Stats.kaplanMeier(df, "g", "t", "e")
      .orderBy("t")
      .as[(String, Long, Long, Long, Long)].collect.toSeq
    val l1 = math.round(math.log(4.0 / 5.0) * 1e6)
    val l3 = math.round(math.log(1.0 / 3.0) * 1e6)
    val s1 = math.round(math.exp(l1 / 1e6) * 1e6)
    val s3 = math.round(math.exp((l1 + l3) / 1e6) * 1e6)
    assert(out == Seq(("k", 1L, 5L, 1L, s1), ("k", 3L, 3L, 2L, s3)))
    assert(s1 == 800000L && math.abs(s3 - 266667L) <= 1)
  }

  test("kaplanMeier: terminal full-death step lands exactly at zero") {
    val df = Seq(("k", 1L, true), ("k", 2L, true)).toDF("g", "t", "e")
    val out = Stats.kaplanMeier(df, "g", "t", "e")
      .orderBy("t").select("s_micro").as[Long].collect.toSeq
    assert(out.last == 0L)
  }

  // --- segmentedTrend -----------------------------------------------------

  test("segmentedTrend: slopes on both sides of the CUSUM break") {
    val rows = for {
      (d, c) <- Seq((1, 2), (2, 4), (3, 6), (4, 30), (5, 40), (6, 50))
      _ <- 1 to c
    } yield ("a", ts(f"2024-03-0$d%d 00:00:00"))
    val out = TimeSeries.segmentedTrend(rows.toDF("k", "t"), "k", "t")
      .collect().head
    assert(out.getDate(1).toString == "2024-03-03")
    assert(out.getLong(2) == 3L && out.getLong(3) == 2000000L)
    assert(out.getLong(4) == 3L && out.getLong(5) == 10000000L)
  }

  // --- randomized parity (seeded, deterministic) --------------------------

  test("spearmanByKey equals local doubled-rank Pearson on random data") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(400 + seed)
      val rows = (1 to 150).map { _ =>
        (s"k${rnd.nextInt(3)}", rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)
      }
      val got = Stats.spearmanByKey(rows.toDF("k", "x", "y"), "k", "x", "y")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      def r2(vs: Seq[Long]): Map[Long, Long] = {
        val sorted = vs.sorted
        vs.distinct.map { v =>
          val o = sorted.count(_ < v).toLong
          val c = sorted.count(_ == v).toLong
          v -> (2 * o + c + 1)
        }.toMap
      }
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val rx = r2(rs.map(_._2)); val ry = r2(rs.map(_._3))
        val xs = rs.map(t => rx(t._2).toDouble)
        val ys = rs.map(t => ry(t._3).toDouble)
        val n = rs.size.toDouble
        val cov = (xs, ys).zipped.map(_ * _).sum - xs.sum * ys.sum / n
        val vx = xs.map(v => v * v).sum - xs.sum * xs.sum / n
        val vy = ys.map(v => v * v).sum - ys.sum * ys.sum / n
        val want = if (rs.size >= 2 && vx > 0 && vy > 0)
          Some(math.round(cov / math.sqrt(vx * vy) * 1e6)) else None
        assert(got(k) == want, s"seed=$seed key=$k")
      }
    }
  }

  test("maxConcurrent equals the local sweep on random interval piles") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(500 + seed)
      val base = ts("2024-01-01 00:00:00").getTime
      val rows = (1 to 120).map { _ =>
        val s0 = rnd.nextInt(1000)
        (s"k${rnd.nextInt(2)}", new Timestamp(base + s0 * 1000L),
          new Timestamp(base + (s0 + 1 + rnd.nextInt(50)) * 1000L))
      }
      val got = TimeSeries.maxConcurrent(rows.toDF("k", "s", "e"),
        "k", "s", "e")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val evs = rs.flatMap(t => Seq((t._2.getTime, 1), (t._3.getTime, -1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
        var run = 0L; var peak = 0L
        evs.foreach { case (_, d) => run += d; peak = math.max(peak, run) }
        assert(got(k) == peak, s"seed=$seed key=$k")
      }
    }
  }

  test("quantilesPerKey equals local type-1 selection on random data") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(600 + seed)
      val rows = (1 to 200).map(_ =>
        (s"k${rnd.nextInt(3)}", rnd.nextInt(40).toLong))
      val ps = Seq(100000L, 500000L, 770000L, 1000000L)
      val got = Stats.quantilesPerKey(rows.toDF("k", "x"), "k", "x", ps)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      rows.groupBy(_._1).foreach { case (k, rs) =>
        val sorted = rs.map(_._2).sorted
        ps.foreach { p =>
          val rank = math.max(1L,
            (p * sorted.size + 999999L) / 1000000L).toInt
          assert(got((k, p)) == sorted(rank - 1), s"seed=$seed $k p=$p")
        }
      }
    }
  }

  // --- mineTemplates ------------------------------------------------------

  test("mineTemplates: constant slots kept, varying slots wildcarded") {
    val df = Seq(
      (1L, "error db timeout 500"),
      (2L, "error db timeout 712"),
      (3L, "error db refused 500"),
      (4L, "user login ok"),
      (5L, "user login ok")).toDF("id", "text")
    val out = TextAnalytics.mineTemplates(df, "id", "text", maxTokens = 16)
      .orderBy("n_tokens")
      .as[(Long, Long, String)].collect.toSeq
    assert(out == Seq(
      (3L, 2L, "user login ok"),
      (4L, 3L, "error db <*> <*>")))
  }

  test("mineTemplates: long messages truncate analysis with a marker") {
    val long1 = (1 to 20).map(i => "tok").mkString(" ")
    val long2 = (1 to 19).map(_ => "tok").mkString(" ") + " zzz"
    val out = TextAnalytics.mineTemplates(
      Seq((1L, long1), (2L, long2)).toDF("id", "text"), "id", "text",
      maxTokens = 16)
      .as[(Long, Long, String)].collect.toSeq
    assert(out == Seq((20L, 2L,
      (1 to 16).map(_ => "tok").mkString(" ") + " <…>")))
  }

  // --- wilcoxonSignedRank / mcnemar --------------------------------------

  test("wilcoxonSignedRank: hand case with ties and dropped zeros") {
    // diffs: +1, -1, +2, +2, -3, 0 → nonzero n=5; |d| ranks:
    // 1,1 → avg 1.5 (r2=3); 2,2 → avg 3.5 (r2=7); 3 → rank 5 (r2=10)
    // W2 = positives: +1(3) + +2(7) + +2(7) = 17
    val df = Seq(("s", 1L), ("s", -1L), ("s", 2L), ("s", 2L), ("s", -3L),
      ("s", 0L)).toDF("k", "d")
    val out = Stats.wilcoxonSignedRank(df, "k", "d").collect().head
    assert(out.getLong(1) == 5L && out.getLong(2) == 17L)
    // mean W2 = 15; 12·var = 2·5·6·11 − Σ(t³−t) = 660 − (6+6+0) = 648
    val z = math.round((17.0 - 15.0) / math.sqrt(648.0 / 12.0) * 1e6)
    assert(out.getLong(3) == z)
  }

  test("mcnemar: discordant-pair statistic, concordant-only → NULL") {
    val df = Seq(
      ("s", true, false), ("s", true, false), ("s", true, false),
      ("s", false, true), ("s", true, true), ("s", false, false),
      ("t", true, true), ("t", false, false))
      .toDF("k", "a", "b")
    val out = Stats.mcnemar(df, "k", "a", "b")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    // s: b01=3, c10=1 → (3−1)²·1e6/4 = 1e6
    assert(out("s") == ((6L, 3L, 1L, Some(1000000L))))
    assert(out("t") == ((2L, 0L, 0L, None)))
  }

  // --- cramersV / cohensD / proportionsZ ---------------------------------

  test("cramersV: perfect association = 1e6, independence = 0") {
    val perfect = Seq(("x", "1"), ("x", "1"), ("y", "2"), ("y", "2"))
      .toDF("a", "b")
    val vP = Stats.cramersV(perfect, "a", "b").collect().head
    assert(vP.getLong(4) == 1000000L)
    val indep = (for (a <- Seq("x", "y"); b <- Seq("1", "2"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val vI = Stats.cramersV(indep, "a", "b").collect().head
    assert(vI.getLong(3) == 0L && vI.getLong(4) == 0L)
  }

  test("cohensD: unit separation on a hand-computed pair") {
    // A: 0, 2000 (css 2e6); B: 1000, 3000 (css 2e6);
    // pooled = 4e6/2 = 2e6, diff = -1000 → d = -1000/sqrt(2e6)
    val df = Seq(("s", "a", 0L), ("s", "a", 2000L),
      ("s", "b", 1000L), ("s", "b", 3000L)).toDF("st", "g", "v")
    val out = Stats.cohensD(df, "st", "g", "a", "b", "v").collect().head
    assert(out.getLong(3) ==
      math.round(-1000.0 / math.sqrt(2e6) * 1e6))
  }

  test("proportionsZ: hand case and degenerate NULLs") {
    // A: 8/10, B: 4/10 → p̂ = 0.6, z = 0.4/sqrt(0.24·0.2)
    val rows = (1 to 10).map(i => ("s", "a", i <= 8)) ++
      (1 to 10).map(i => ("s", "b", i <= 4)) ++
      Seq(("allpos", "a", true), ("allpos", "b", true))
    val df = rows.toDF("st", "g", "y")
    val out = Stats.proportionsZ(df, "st", "g", "a", "b", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    val z = math.round(0.4 / math.sqrt(0.6 * 0.4 * 0.2) * 1e6)
    assert(out("s").contains(z))
    assert(out("allpos").isEmpty) // p̂ = 1 → NULL, not a fake infinity
  }

  // --- candidateKeys ------------------------------------------------------

  test("candidateKeys: unique non-null column is a key; others are not") {
    val df = Seq((1L, Some("a"), "x"), (2L, Some("a"), "y"),
      (3L, None, "x")).toDF("id", "tag", "grp")
    val out = KeyChecks.candidateKeys(df, Seq("id", "tag", "grp"))
      .as[(String, Long, Long, Long, Boolean)].collect.toSeq
    assert(out == Seq(
      ("id", 3L, 3L, 0L, true),
      ("tag", 3L, 1L, 1L, false),
      ("grp", 3L, 2L, 0L, false)))
  }

  test("compositeKeys: null-safe tuple keys, lattice-implied supersets " +
    "carry sentinels and lose minimality") {
    // id unique; (grp, sub) unique only as a pair; NULLs compare equal
    // (two (NULL, x) rows collide -> not a key)
    val df = Seq(
      (1L, Some("a"), 1L), (2L, Some("a"), 2L),
      (3L, Some("b"), 1L), (4L, Some("b"), 2L)).toDF("id", "grp", "sub")
    val out = KeyChecks.compositeKeys(df, Seq("grp", "id", "sub"), 2)
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)].collect.toSeq
    assert(out == Seq(
      ("grp", 1L, 4L, 2L, 0L, false, false),
      ("id", 1L, 4L, 4L, 0L, true, true),
      ("sub", 1L, 4L, 2L, 0L, false, false),
      ("grp,id", 2L, 4L, -1L, -1L, true, false),   // implied, unscanned
      ("grp,sub", 2L, 4L, 4L, 0L, true, true),     // minimal composite
      ("id,sub", 2L, 4L, -1L, -1L, true, false)))
    // null-safe: duplicate (NULL) tuples block keyness
    val withNulls = Seq((Some(1L), "x"), (None, "y"), (None, "z"))
      .toDF("a", "b")
    val o2 = KeyChecks.compositeKeys(withNulls, Seq("a"), 1)
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)].collect.head
    assert(o2 == (("a", 1L, 3L, 2L, 2L, false, false)))
  }

  test("candidateKeys: empty input profiles to zero counts, no NPE") {
    val df = Seq((1L, "a")).toDF("id", "tag").where(lit(false))
    val out = KeyChecks.candidateKeys(df, Seq("id", "tag"))
      .as[(String, Long, Long, Long, Boolean)].collect.toSeq
    // 0 distinct == 0 rows with 0 nulls: vacuously a key on empty input
    assert(out == Seq(("id", 0L, 0L, 0L, true), ("tag", 0L, 0L, 0L, true)))
  }

  test("bootstrapMeans: empty replicate emits NULL mean, not garbage") {
    // a single row: some replicates draw weight 0 → NULL mean
    val df = Seq(("k", 1L, 5000L)).toDF("k", "id", "v")
    val out = Stats.bootstrapMeans(df, "k", "id", "v", reps = 40, seed = 1L)
      .as[(String, Long, Long, Option[Long])].collect.toSeq
    assert(out.exists(_._3 == 0L) || out.size == 40)
    assert(out.filter(_._3 == 0L).forall(_._4.isEmpty))
    assert(out.filter(_._3 > 0L).forall(_._4.contains(5000000L)))
  }

  test("inclusionDeps: containment holds, fails with exact miss counts, " +
    "NULLs ignored") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None)
      .toDF("c")
    val parent = Seq(Some(1L), Some(2L), None).toDF("p")
    val out = KeyChecks.inclusionDeps(Seq(
      ("c_in_p", child, "c", parent, "p"),
      ("p_in_c", parent, "p", child, "c")))
      .as[(String, Long, Long, Long, Boolean)].collect
      .map(r => r._1 -> r).toMap
    // child {1,2,3} vs parent {1,2}: 3 distinct, 1 missing, fails
    assert(out("c_in_p") == (("c_in_p", 3L, 2L, 1L, false)))
    // parent {1,2} ⊆ child {1,2,3}: holds
    assert(out("p_in_c") == (("p_in_c", 2L, 3L, 0L, true)))
  }

  test("fdError: hand-computed g3, exact FDs report holds") {
    // a → {1,1,2}: keep 2 of 3; b → {3,3}: keep 2 of 2
    // → n=5, keep=4, remove=1, g3 = 200000 ppm
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 3L), ("b", 3L))
      .toDF("x", "y")
    val out = KeyChecks.fdError(df, Seq("x"), "y")
      .as[(Long, Long, Long, Long, Boolean)].collect.head
    assert(out == ((5L, 4L, 1L, 200000L, false)), out)
    // exact FD: every x maps to one y
    val clean = Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("x", "y")
    val out2 = KeyChecks.fdError(clean, Seq("x"), "y")
      .as[(Long, Long, Long, Long, Boolean)].collect.head
    assert(out2 == ((3L, 3L, 0L, 0L, true)), out2)
  }

  test("tCloseness: hand-computed ordinal EMD, global-matching group " +
    "scores zero") {
    // global over {A:(1,1), B:(2,2), C:(1,2)}: C1=3, C2=3, N=6, m=2.
    // A: D1 = 2·6 − 3·2 = 6 → EMD = 6/(2·6·1) = 0.5; B symmetric;
    // C matches the global distribution → EMD 0.
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L),
      ("C", 1L), ("C", 2L)).toDF("g", "v")
    val out = KeyChecks.tCloseness(df, Seq("g"), "v", tMicro = 400000L)
      .as[(String, Long, Long, Long, Boolean)].collect
      .map(r => r._1 -> r).toMap
    assert(out("A") == (("A", 2L, 2L, 500000L, true)), out("A"))
    assert(out("B") == (("B", 2L, 2L, 500000L, true)), out("B"))
    assert(out("C") == (("C", 2L, 2L, 0L, false)), out("C"))
  }

  test("tCloseness: single-value domain gives EMD 0") {
    val df = Seq(("A", 5L), ("B", 5L)).toDF("g", "v")
    val out = KeyChecks.tCloseness(df, Seq("g"), "v", tMicro = 0L)
      .as[(String, Long, Long, Long, Boolean)].collect.toSeq
    assert(out.forall(r => r._4 == 0L && !r._5), out)
  }
}
