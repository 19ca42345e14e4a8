package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaHalfPerKey folds (e + x) div 2 in ts order") {
    val df = Seq(
      (1L, "2024-01-01 00:00:02", 100L),
      (1L, "2024-01-01 00:00:01", 10L),   // out of order on purpose
      (1L, "2024-01-01 00:00:03", 50L),
      (2L, "2024-01-01 00:00:01", 7L))
      .toDF("k", "ts", "v").withColumn("ts", to_timestamp($"ts"))
    val out = TimeSeries.ewmaHalfPerKey(df, "k", "ts", "v")
      .orderBy("k").as[(Long, Long, Long)].collect.toSeq
    // key 1: fold over 10, 100, 50 → (10+100)/2=55 → (55+50)/2=52
    assert(out == Seq((1L, 3L, 52L), (2L, 1L, 7L)))
  }

  test("ewmaHalfPerKey converges toward a constant series' level") {
    val df = (1 to 40).map(i => (1L, f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d", 1000L))
      .toDF("k", "ts", "v").withColumn("ts", to_timestamp($"ts"))
    val Array((_, _, e)) = TimeSeries.ewmaHalfPerKey(df, "k", "ts", "v")
      .as[(Long, Long, Long)].collect()
    assert(e == 1000L)
  }

  test("ewmaHalfPerKey raises a named error when a key exceeds maxPerKey") {
    val df = (1 to 50).map(i => (1L, f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d", 10L))
      .toDF("k", "ts", "v").withColumn("ts", to_timestamp($"ts"))
    val ex = intercept[Exception] {
      TimeSeries.ewmaHalfPerKey(df, "k", "ts", "v", maxPerKey = 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(m =>
      m.contains("ewmaHalfPerKey") && m.contains("maxPerKey=10")), ex.toString)
    // keys at the cap still compute (the guard is > not >=)
    val ok = TimeSeries.ewmaHalfPerKey(df, "k", "ts", "v", maxPerKey = 50L)
      .as[(Long, Long, Long)].collect()
    assert(ok.head._2 == 50L)
  }

  test("holtHalfPerKey: hand-computed level+trend, truncating halves " +
    "on a declining series, single point, value-bound guard") {
    val s = spark
    import s.implicits._
    def series(vs: Seq[Long]) = vs.zipWithIndex
      .map { case (v, i) => (1L, new java.sql.Timestamp(1000L * (i + 1)), v) }
      .toDF("k", "ts", "v")
    // [10,20,30]: l=10,b=0 → l=15,b=2 → l=23,b=5
    val up = TimeSeries.holtHalfPerKey(series(Seq(10L, 20L, 30L)),
      "k", "ts", "v").as[(Long, Long, Long, Long)].collect.head
    assert(up == ((1L, 3L, 23L, 5L)), up)
    // [30,20,10]: trunc halving on negatives: b = -5 div 2 = -2,
    // then l=16, b = -11 div 2 = -5
    val down = TimeSeries.holtHalfPerKey(series(Seq(30L, 20L, 10L)),
      "k", "ts", "v").as[(Long, Long, Long, Long)].collect.head
    assert(down == ((1L, 3L, 16L, -5L)), down)
    val one = TimeSeries.holtHalfPerKey(series(Seq(7L)),
      "k", "ts", "v").as[(Long, Long, Long, Long)].collect.head
    assert(one == ((1L, 1L, 7L, 0L)), one)
    // round 9: the bound tightened 2^30 → 2^29 so a packed state can
    // never fall under the oracle's 2^40 raw-vs-packed line; a value
    // AT the old bound's floor (2^29) must now raise too
    val err = intercept[Exception] {
      TimeSeries.holtHalfPerKey(series(Seq(1L << 29)), "k", "ts", "v")
        .collect()
    }
    assert(err.getMessage.contains("2^29"), err.getMessage)
    // just inside the new bound still folds
    val ok = TimeSeries.holtHalfPerKey(series(Seq((1L << 29) - 1)),
      "k", "ts", "v").as[(Long, Long, Long, Long)].collect.head
    assert(ok._3 == (1L << 29) - 1 && ok._4 == 0L, ok)
  }

  test("ljungBox: hand-computed lag-1 case, degenerate series NULL out") {
    val s = spark
    import s.implicits._
    // daily counts 1..6 (event multiplicity per day): x̄=3.5,
    // den=17.5; lag-1: sxy=70, sh=15, st=20, m=5 → r=0.5,
    // term=round(0.25e6/5)=50000 → Q = 6·8·50000 = 2 400 000
    def evts(key: Long, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, d) => Seq.fill(c)((key,
        java.sql.Timestamp.valueOf(s"2024-01-${"%02d".format(d + 1)} 12:00:00")))
    }
    val df = (evts(1L, Seq(1, 2, 3, 4, 5, 6)) ++
      evts(2L, Seq(7, 7, 7, 7, 7, 7)) ++ // constant → zero variance
      evts(3L, Seq(3, 4)) ++             // minimal two-day series
      evts(4L, Seq(5)))                  // single day: no lag pair
      .toDF("k", "ts")
    val got = TimeSeries.ljungBox(df, "k", "ts", maxLag = 1)
      .as[(Long, Long, Long, Option[Long])].collect
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 1L, Some(2400000L))), got(1L))
    assert(got(2L)._4.isEmpty, got(2L))   // zero variance
    // [3,4]: r = −0.5, term = 250000·1 → Q = 2·4·250000
    assert(got(3L) == ((3L, 2L, 1L, Some(2000000L))), got(3L))
    // a key with no lag pairs at all emits no row
    assert(!got.contains(4L), got.get(4L))
  }
}
