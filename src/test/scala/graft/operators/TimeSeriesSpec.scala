package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class TimeSeriesSpec extends SparkSpec {

  test("gapFill: grid completes the span, zero vs forward semantics, leading NULLs kept") {
    val s = spark
    import s.implicits._
    val daily = Seq(
      ("a", Date.valueOf("2024-01-01"), 10L),
      ("a", Date.valueOf("2024-01-04"), 40L),
      ("b", Date.valueOf("2024-01-03"), 30L)
    ).toDF("grp", "d", "v")
    // zero fill: every (key, day) cell exists, holes are 0
    val zero = TimeSeries.gapFill(daily, "grp", "d", "v", forward = false)
      .orderBy("grp", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(zero.length == 8, "2 keys x 4 days")
    assert(zero.toSeq == Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 0L),
      ("a", "2024-01-03", 0L), ("a", "2024-01-04", 40L),
      ("b", "2024-01-01", 0L), ("b", "2024-01-02", 0L),
      ("b", "2024-01-03", 30L), ("b", "2024-01-04", 0L)))
    // forward fill: levels carry across holes; before a key's first
    // observation the value stays NULL (no fabricated level)
    val fwd = TimeSeries.gapFill(daily, "grp", "d", "v", forward = true)
      .orderBy("grp", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(fwd.toSeq == Seq(
      ("a", "2024-01-01", Some(10L)), ("a", "2024-01-02", Some(10L)),
      ("a", "2024-01-03", Some(10L)), ("a", "2024-01-04", Some(40L)),
      ("b", "2024-01-01", None), ("b", "2024-01-02", None),
      ("b", "2024-01-03", Some(30L)), ("b", "2024-01-04", Some(30L))))
    // single-day span degenerates to the input
    val one = Seq(("a", Date.valueOf("2024-02-01"), 7L)).toDF("grp", "d", "v")
    assert(TimeSeries.gapFill(one, "grp", "d", "v", forward = true)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq == Seq(("a", 7L)))
  }

  test("rollingSum: trailing window sums exactly, truncates at series start, NULL-transparent") {
    val s = spark
    import s.implicits._
    val grid = Seq(
      ("a", Date.valueOf("2024-01-01"), Some(1L)),
      ("a", Date.valueOf("2024-01-02"), Some(2L)),
      ("a", Date.valueOf("2024-01-03"), Some(4L)),
      ("a", Date.valueOf("2024-01-04"), Some(8L)),
      ("b", Date.valueOf("2024-01-01"), None),
      ("b", Date.valueOf("2024-01-02"), Some(5L))
    ).toDF("grp", "d", "v")
    val out = TimeSeries.rollingSum(grid, "grp", "d", "v", days = 3)
      .orderBy("grp", "d").collect()
      .map(r => (r.getString(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      ("a", Some(1L)), ("a", Some(3L)), ("a", Some(7L)), ("a", Some(14L)),
      ("b", None), ("b", Some(5L))),  // leading NULL window is NULL, then ignores it
      out.toSeq.toString)
  }

  test("trendPerKey: recovers exact lines, noisy fit is least-squares, degenerate keys silent") {
    val s = spark
    import s.implicits._
    // key a: y = 3x + 5 exactly; key b: y = -2x + 100 exactly;
    // key c: one point; key d: constant x
    val rows =
      (0L to 9L).map(x => ("a", x, 3 * x + 5)) ++
      (0L to 9L).map(x => ("b", x, -2 * x + 100)) ++
      Seq(("c", 1L, 10L), ("d", 4L, 1L), ("d", 4L, 9L))
    val got = TimeSeries.trendPerKey(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got("a") == ((3000000L, 5000000L)), got.toString)
    assert(got("b") == ((-2000000L, 100000000L)), got.toString)
    assert(!got.contains("c") && !got.contains("d"),
      "single-point and constant-x keys have no line")
    // least squares on symmetric noise: slope unchanged, intercept is the mean
    val noisy = Seq(("n", 0L, 0L), ("n", 1L, 2L), ("n", 2L, 0L), ("n", 3L, 2L))
    val nf = TimeSeries.trendPerKey(noisy.toDF("k", "x", "y"), "k", "x", "y")
      .collect().head
    assert(nf.getLong(2) == 400000L, s"slope: ${nf.getLong(2)}")   // 0.4
    assert(nf.getLong(3) == 400000L, s"icept: ${nf.getLong(3)}")   // 0.4
  }

  test("anomalies: spike flags against its own history, baseline excludes current day") {
    val s = spark
    import s.implicits._
    // 10 flat days then a spike; flat noise alternates 10/12 so the
    // baseline variance is nonzero
    val rows = (1 to 10).map(i =>
      ("a", Date.valueOf(f"2024-01-$i%02d"), if (i % 2 == 0) 12L else 10L)) :+
      (("a", Date.valueOf("2024-01-11"), 500L))
    val grid = rows.toDF("grp", "d", "v")
    val hits = TimeSeries.anomalies(grid, "grp", "d", "v",
      days = 14, zThresholdMicro = 3000000L, minPoints = 5)
      .collect().map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    assert(hits.length == 1 && hits.head._1 == "2024-01-11" && hits.head._2 == 500L,
      hits.toSeq.toString)
    assert(hits.head._3 > 3000000L, "spike z must exceed the threshold positively")
    // the spike day's own value is NOT in its baseline: z uses the
    // flat history's mean ~11, so z is enormous; verify magnitude
    assert(hits.head._3 > 100000000L, s"self-excluding baseline expected: ${hits.head._3}")
    // constant history: zero variance -> no verdict, even for a jump
    val const = ((1 to 10).map(i => ("b", Date.valueOf(f"2024-02-$i%02d"), 7L)) :+
      (("b", Date.valueOf("2024-02-11"), 900L))).toDF("grp", "d", "v")
    assert(TimeSeries.anomalies(const, "grp", "d", "v", 14, 3000000L).count() == 0)
    // too-short history: silent
    val short = Seq(("c", Date.valueOf("2024-03-01"), 1L),
      ("c", Date.valueOf("2024-03-02"), 999L)).toDF("grp", "d", "v")
    assert(TimeSeries.anomalies(short, "grp", "d", "v", 14, 3000000L).count() == 0)
  }

  test("funnel: strict ordering chains steps, out-of-order events don't convert") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(d)
    val ev = Seq(
      // u1 converts fully in order
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "buy"),
      // u2: clicked BEFORE viewing — click must not count; a later
      // click after the view does
      (2L, ts("2024-01-01 08:00:00"), "click"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 12:00:00"), "click"),
      // u3: only views
      (3L, ts("2024-01-01 09:30:00"), "view"),
      // u4: buys before any view — never enters the funnel
      (4L, ts("2024-01-01 07:00:00"), "buy")
    ).toDF("user_id", "t", "et")
    val got = TimeSeries.funnel(ev, "user_id", "t", "et",
      Seq("view", "click", "buy"))
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "view", 3L), (2L, "click", 2L), (3L, "buy", 1L)),
      got.toString)
  }

  test("cohortRetention: first touch fixes the cohort, offsets count distinct users") {
    val s = spark
    import s.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(d + " 10:00:00")
    // 2024-01-01 and 2024-01-08 are Mondays (week starts)
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")),  // same week: one cell
      (1L, ts("2024-01-10")),                           // week+1
      (2L, ts("2024-01-03")),                           // cohort w0, never returns
      (3L, ts("2024-01-08")), (3L, ts("2024-01-16"))    // cohort w1, returns w2
    ).toDF("user_id", "t")
    val got = TimeSeries.cohortRetention(ev, "user_id", "t")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L),   // users 1 and 2 in week-0 cohort, week 0
      ("2024-01-01", 1L, 1L),   // only user 1 returns in week 1
      ("2024-01-08", 0L, 1L),   // user 3's own cohort
      ("2024-01-08", 1L, 1L)),  // user 3 returns
      got.toString)
  }

  test("periodDelta: lag, delta, micro pct; no-prior and zero-base stay NULL") {
    val s = spark
    import s.implicits._
    val grid = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 0L),
      ("a", "2024-01-03", 15L), ("a", "2024-01-04", 30L),
      ("b", "2024-01-03", 7L), ("b", "2024-01-04", 7L))
      .toDF("k", "d", "v")
      .withColumn("d", org.apache.spark.sql.functions.to_date($"d"))
    val out = TimeSeries.periodDelta(grid, "k", "d", "v", lagDays = 2)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[java.sql.Date]("d").toString) ->
        (Option(r.getAs[Any]("prev_value")), Option(r.getAs[Any]("delta")),
          Option(r.getAs[Any]("pct_micro")))).toMap
    // first lagDays rows per key have no prior period
    assert(out(("a", "2024-01-01")) === (None, None, None))
    assert(out(("b", "2024-01-03")) === (None, None, None))
    // a@03: prev 10 → delta 5, +50%
    assert(out(("a", "2024-01-03")) === (Some(10L), Some(5L), Some(500000L)))
    // a@04: prev 0 → delta defined, pct NULL (no fabricated %)
    assert(out(("a", "2024-01-04")) === (Some(0L), Some(30L), None))
  }

  test("lagCorrDaily: perfectly autocorrelated and anti-correlated keys") {
    val s = spark
    import s.implicits._
    // key "up": daily counts 1,2,3,4,5 → lag-1 pairs (1,2)..(4,5), r = 1
    // key "alt": counts 1,3,1,3,1 → pairs perfectly anti-correlated, r = −1
    def mk(key: String, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, day) => (1 to c).map(_ =>
        (key, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")))
    }
    val df = (mk("up", Seq(1, 2, 3, 4, 5)) ++ mk("alt", Seq(1, 3, 1, 3, 1)))
      .toDF("k", "ts")
    val out = TimeSeries.lagCorrDaily(df, "k", "ts", lag = 1)
      .as[(String, Long, Option[Long])].collect.map(r => r._1 -> r).toMap
    assert(out("up") == ("up", 4L, Some(1000000L)))
    assert(out("alt") == ("alt", 4L, Some(-1000000L)))
  }

  test("lagCorrDaily: gaps break pairs; constant series yields NULL r") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // key "gap": days 1, 2, 4 — only (1,2) pairs up; 1 pair → NULL r
      ("gap", "2024-01-01"), ("gap", "2024-01-02"), ("gap", "2024-01-02"),
      ("gap", "2024-01-04"),
      // key "flat": constant 1/day → zero variance → NULL r
      ("flat", "2024-01-01"), ("flat", "2024-01-02"), ("flat", "2024-01-03"))
      .map { case (k, d) =>
        (k, java.sql.Timestamp.valueOf(s"$d 00:30:00")) }
    val out = TimeSeries.lagCorrDaily(rows.toDF("k", "ts"), "k", "ts", 1)
      .as[(String, Long, Option[Long])].collect.map(r => r._1 -> r).toMap
    assert(out("gap") == ("gap", 1L, None))
    assert(out("flat") == ("flat", 2L, None))
  }

  test("runsTest: clustered signs → 2 runs (z < 0), alternating → " +
    "4 runs (z > 0), at-mean days drop") {
    val s = spark
    import s.implicits._
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-02-$d%02d 12:00:00")
    // counts 3,3,1,1 (mean 2): hi,hi,lo,lo → 2 runs
    val clus = Seq(3, 3, 1, 1).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("c", day(i + 1))) }
    // counts 3,1,3,1 → 4 runs
    val alt = Seq(3, 1, 3, 1).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("a", day(i + 1))) }
    // counts 3,2,1 (mean 2): the middle AT-mean day drops → n = 2
    val tie = Seq(3, 2, 1).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("t", day(i + 1))) }
    val got = TimeSeries.runsTest(
      (clus ++ alt ++ tie).toDF("k", "ts"), "k", "ts")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect
      .map(r => r._1 -> r).toMap
    // n1 = n2 = 2: E = 3, Var = 8·4/(16·3) = 2/3
    val z0 = math.round(1.0 / math.sqrt(2.0 / 3.0) * 1e6)
    assert(got("c") == (("c", 4L, 2L, 2L, 2L, Some(-z0))), got("c"))
    assert(got("a") == (("a", 4L, 2L, 2L, 4L, Some(z0))), got("a"))
    assert(got("t")._2 == 2L && got("t")._5 == 2L, got("t"))
  }

  test("vonNeumannRatio: trend → 0.6, alternation → 3, constant → NULL") {
    val s = spark
    import s.implicits._
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // trend: counts 1,2,3,4 → n·Σd²/(nΣx²−(Σx)²) = 12/20 = 0.6
    val trend = (1 to 4).flatMap(d => Seq.fill(d)(("t", day(d))))
    // alternation: 1,3,1,3 → 4·12/16 = 3
    val alt = Seq(1, 3, 1, 3).zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("a", day(i + 1))) }
    // constant: 2,2,2 → zero variance → NULL
    val const = (1 to 3).flatMap(d => Seq.fill(2)(("c", day(d))))
    val got = TimeSeries.vonNeumannRatio(
      (trend ++ alt ++ const).toDF("k", "ts"), "k", "ts")
      .as[(String, Long, Long, Option[Long])].collect
      .map(r => r._1 -> r).toMap
    assert(got("t") == (("t", 4L, 3L, Some(600000L))), got("t"))
    assert(got("a") == (("a", 4L, 3L, Some(3000000L))), got("a"))
    assert(got("c") == (("c", 3L, 2L, None)), got("c"))
  }
}
