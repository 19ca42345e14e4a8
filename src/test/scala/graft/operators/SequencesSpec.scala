package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toDF("u", "ts", "et", "v").withColumn("ts", to_timestamp($"ts"))

  test("markovTransitions counts adjacent pairs and row-normalizes") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "a", 0), (1L, "2024-01-01 00:01:00", "b", 0),
      (1L, "2024-01-01 00:02:00", "a", 0), (1L, "2024-01-01 00:03:00", "a", 0),
      (2L, "2024-01-01 00:00:00", "a", 0), (2L, "2024-01-01 00:01:00", "b", 0))
    val out = Sequences.markovTransitions(df, "u", "ts", "et")
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Long)].collect.toSeq
    // a→b ×2, a→a ×1 (P 2/3, 1/3); b→a ×1 (P 1); last events emit nothing
    assert(out == Seq(
      ("a", "a", 1L, 333333L), ("a", "b", 2L, 666667L), ("b", "a", 1L, 1000000L)))
  }

  test("markovTransitions orders within key only — keys never chain") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "x", 0),
      (2L, "2024-01-01 00:00:30", "y", 0))
    assert(Sequences.markovTransitions(df, "u", "ts", "et").count() == 0)
  }

  test("touchAttribution credits first/last touch in window, NULL outside") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "view", 0.0),   // first touch
      (1L, "2024-01-02 00:00:00", "click", 0.0),  // last touch
      (1L, "2024-01-03 00:00:00", "purchase", 10.0),
      // second user: only touch is outside the 7-day lookback
      (2L, "2024-01-01 00:00:00", "view", 0.0),
      (2L, "2024-01-20 00:00:00", "purchase", 5.0),
      // purchase with NO preceding event at all
      (3L, "2024-01-05 00:00:00", "purchase", 2.0))
    val out = Sequences.touchAttribution(df, "u", "ts", "et", "v", "purchase", 7)
      .orderBy("touch", "channel")
      .as[(String, Option[String], Long, Long)].collect.toSeq
    assert(out == Seq(
      ("first", None, 2L, 700L), ("first", Some("view"), 1L, 1000L),
      ("last", None, 2L, 700L), ("last", Some("click"), 1L, 1000L)))
  }

  test("touchAttribution skips other purchases when picking the touch") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "click", 0.0),
      (1L, "2024-01-02 00:00:00", "purchase", 1.0),
      (1L, "2024-01-03 00:00:00", "purchase", 2.0))
    val out = Sequences.touchAttribution(df, "u", "ts", "et", "v", "purchase", 7)
      .where($"touch" === "last").orderBy("channel")
      .as[(String, Option[String], Long, Long)].collect.toSeq
    // both purchases attribute to the click, not to each other
    assert(out == Seq(("last", Some("click"), 2L, 300L)))
  }

  test("topPaths3 counts consecutive trigrams with a deterministic top-N cut") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "a", 0), (1L, "2024-01-01 00:01:00", "b", 0),
      (1L, "2024-01-01 00:02:00", "c", 0), (1L, "2024-01-01 00:03:00", "a", 0),
      (2L, "2024-01-01 00:00:00", "a", 0), (2L, "2024-01-01 00:01:00", "b", 0),
      (2L, "2024-01-01 00:02:00", "c", 0),
      // a 2-event key contributes no trigram
      (3L, "2024-01-01 00:00:00", "a", 0), (3L, "2024-01-01 00:01:00", "b", 0))
    val all = Sequences.topPaths3(df, "u", "ts", "et", topN = 10)
      .as[(String, String, String, Long)].collect.toSeq
    // key 1: abc, bca; key 2: abc → abc×2 first, then bca
    assert(all == Seq(("a", "b", "c", 2L), ("b", "c", "a", 1L)))
    // the cut keeps the count-desc path-asc prefix
    val top1 = Sequences.topPaths3(df, "u", "ts", "et", topN = 1)
      .as[(String, String, String, Long)].collect.toSeq
    assert(top1 == Seq(("a", "b", "c", 2L)))
  }

  test("episodePairs: gap band, strict order, per-key isolation, " +
    "every in-window occurrence pair counted") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // u1: A@0, B@30, B@50, C@120; u2: B@10 (must not pair with u1's A)
    val df = Seq(
      ("u1", ts(0), "A"), ("u1", ts(30), "B"), ("u1", ts(50), "B"),
      ("u1", ts(120), "C"), ("u2", ts(10), "B"))
      .toDF("u", "ts", "et")
    // gap 60s: A→B twice (Δ30, Δ50), B→B once (Δ20); C out of range
    val got = Sequences.episodePairs(df, "u", "ts", "et",
      gapSeconds = 60L, minSupport = 1L)
      .as[(String, String, Long)].collect.map(r => (r._1, r._2) -> r._3)
      .toMap
    assert(got == Map(("A", "B") -> 2L, ("B", "B") -> 1L), got)
    // support threshold drops the singleton pair
    val top = Sequences.episodePairs(df, "u", "ts", "et", 60L, 2L)
      .as[(String, String, Long)].collect.toSeq
    assert(top == Seq(("A", "B", 2L)), top)
  }
}
