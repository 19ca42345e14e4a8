package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity ordered-event analytics: what follows what. The event
  * stream shapes here (journey transition matrices, conversion
  * attribution) are window-over-key plans — one shuffle on the entity
  * key, per-key group size bounded by that entity's event count,
  * never corpus-wide state. The q153 funnel / q151 cohort family's
  * sequential cousins.
  */
object Sequences {

  /** First-order Markov transition matrix of `stateCol` ordered by
    * (`tsCol`, `tieCols`…) within each `keyCol`: for every observed
    * (from, to) adjacent pair, its count and the row-normalized
    * probability in integer micros (count/row_total under a FIXED
    * float op order over exact longs — replays bit-identically).
    * Self-transitions count; each key's last event emits nothing.
    *
    * Scale shape: one shuffle on key for the lead() window (bounded
    * per-key groups), then a map-side-combined groupBy on the tiny
    * (from, to) state-pair domain; the final normalize joins against
    * the per-from totals — a broadcast, the state domain is small by
    * definition (else a Markov matrix is the wrong model).
    * Output: (from_state, to_state, n, p_micro). */
  def markovTransitions(df: DataFrame, keyCol: String, tsCol: String,
                        stateCol: String,
                        tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    val pairs = df
      .select(col(keyCol) +: col(tsCol) +: col(stateCol).as("from_state") +:
        tieCols.map(col): _*)
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .where(col("to_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_state")
      .agg(sum(col("n")).as("row_total"))
    pairs.join(broadcast(totals), Seq("from_state"))
      .withColumn("p_micro",
        round(col("n").cast("double") / col("row_total").cast("double") * 1e6)
          .cast("long"))
      .select("from_state", "to_state", "n", "p_micro")
  }

  /** Top event-type trigram paths: the "what do users actually do"
    * report — every 3-step (a → b → c) run of consecutive events
    * within a key, counted corpus-wide, top `topN` by (count DESC,
    * path ASC). Two lead() taps on ONE key window (single shuffle,
    * bounded per-key groups), a map-side-combined count on the tiny
    * path domain, and a TakeOrdered for the top-N (never a global
    * sort). The deterministic tie-break makes the cut SQL-replayable.
    * Output: (p1, p2, p3, n). */
  def topPaths3(df: DataFrame, keyCol: String, tsCol: String,
                typeCol: String, topN: Int,
                tieCols: Seq[String] = Nil): DataFrame = {
    require(topN > 0, "topN must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieCols.map(col): _*)
    df
      .select(col(keyCol) +: col(tsCol) +: col(typeCol).as("p1") +:
        tieCols.map(col): _*)
      .withColumn("p2", lead(col("p1"), 1).over(w))
      .withColumn("p3", lead(col("p1"), 2).over(w))
      .where(col("p3").isNotNull)
      .groupBy("p1", "p2", "p3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
      .limit(topN)
  }

  /** Position-based conversion attribution: each conversion event
    * (`typeCol` == `conversionType`) credits its value to the LAST
    * and (separately) the FIRST non-conversion event of the same key
    * within the strictly-preceding `lookbackDays` window. Both
    * touches come from ONE range-frame window over the epoch-micros
    * ordering — `[ts − lookback, ts)` per conversion, first/last with
    * ignoreNulls skipping other conversions — so there is NO
    * self-join: one shuffle on key, per-key bounded frames.
    * Conversions with no touch in the window fall into the NULL
    * channel (unattributable). Requires (key, ts) unique — the frame
    * ordering must be total for the pick to be deterministic.
    *
    * Output: (touch ∈ {first, last}, channel, n_conversions,
    * revenue_cents) with revenue in exact cents. */
  def touchAttribution(df: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, valueCol: String,
                       conversionType: String,
                       lookbackDays: Int): DataFrame = {
    val touchCh = when(col(typeCol) =!= conversionType, col(typeCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("epoch_us"))
      .rangeBetween(-lookbackDays * 86400000000L, -1L)
    val tagged = df
      .withColumn("epoch_us", unix_micros(col(tsCol)))
      .withColumn("last_ch", last(touchCh, ignoreNulls = true).over(w))
      .withColumn("first_ch", first(touchCh, ignoreNulls = true).over(w))
      .where(col(typeCol) === conversionType)
      .withColumn("cents", round(col(valueCol) * 100).cast("long"))
    def side(touch: String, ch: String) = tagged
      .groupBy(lit(touch).as("touch"), col(ch).as("channel"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("cents")).as("revenue_cents"))
    side("first", "first_ch")
      .unionByName(side("last", "last_ch"))
      .select("touch", "channel", "n_conversions", "revenue_cents")
  }

  /** Per-user conversion latency: for each user, seconds from their
    * FIRST `fromType` event to the first `toType` event strictly
    * after it — the raw material for time-to-convert percentiles
    * (compose with [[Stats.quantilesPerKey]]) and SLA monitors. Two
    * filtered aggregates + one equi-join on user — both sides are
    * filtered to their event type BEFORE the shuffle, and the
    * earliest-qualifying-b pick is an aggregate, not a window, so a
    * hot user costs one group, never a sort. Non-converting users
    * emit nothing (NULL latency would poison percentiles). Output:
    * (u, latency_s). */
  def timeToConvert(df: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromType: String,
                    toType: String): DataFrame = {
    val a = df.where(col(typeCol) === fromType)
      .groupBy(col(userCol).as("u"))
      .agg(min(unix_micros(col(tsCol))).as("ta"))
    val b = df.where(col(typeCol) === toType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("tb"))
    a.join(b, Seq("u"))
      .where(col("tb") > col("ta"))
      .groupBy("u", "ta").agg(min("tb").as("tb"))
      .select(col("u"), expr("(tb - ta) div 1000000L").as("latency_s"))
  }

  /** Frequent precedence pairs (a strictly-before b, NOT necessarily
    * adjacent) across user event streams — the sequential-pattern
    * screen complementing [[topPaths3]]'s adjacent windows: "users who
    * ever do a later do b" regardless of what happens in between.
    * Support counts DISTINCT users exhibiting the pair.
    *
    * The scale trick: a user's raw stream never self-joins. Per
    * (user, type) only (min_ts, max_ts) survive the first aggregate,
    * and the pair (a, b) holds for a user iff min_ts(a) < max_ts(b) —
    * so the join is T×T per user with T = the user's DISTINCT type
    * count (vocabulary-bounded), not events². Self-pairs (a = a) are
    * excluded. Output: (t1, t2, support) with support ≥ minSupport. */
  def precedencePairs(df: DataFrame, keyCol: String, typeCol: String,
                      tsCol: String, minSupport: Long): DataFrame = {
    val spans = df
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("u"), col(typeCol).as("t"))
      .agg(min(unix_micros(col(tsCol))).as("lo"),
        max(unix_micros(col(tsCol))).as("hi"))
    spans.select(col("u"), col("t").as("t1"), col("lo"))
      .join(spans.select(col("u"), col("t").as("t2"), col("hi")), Seq("u"))
      .where(col("t1") =!= col("t2") && col("lo") < col("hi"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Gap-constrained serial episode pairs (the length-2 WINEPI
    * episodes of Mannila, Toivonen & Verkamo 1997, "Discovery of
    * frequent episodes in event sequences"): support of the ordered
    * pair a → b counts every (occurrence-of-a, occurrence-of-b) with
    * 0 < t_b − t_a ≤ gap in the same key's stream.
    * [[markovTransitions]] sees only ADJACENT steps and
    * [[precedencePairs]] ignores distance entirely; the gap band is
    * the "users who do X do Y within the hour" support a rule miner
    * needs. Strictly-after semantics (simultaneous events never
    * pair) keep the count replayable with no ordering tie-breaks.
    *
    * Scale shape: a key-co-partitioned band self-join — both sides
    * shuffle ONCE on the key, the band bounds per-row fan-out by the
    * key's event rate × gap (the rangeJoin posture; a skewed hot key
    * bounds at rate·gap pairs, not n²). Output: (a, b, support) for
    * support ≥ minSupport. */
  def episodePairs(df: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, gapSeconds: Long,
                   minSupport: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val base = df
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("u"), col(typeCol).as("t"),
        unix_micros(col(tsCol)).as("ts"))
    val l = base.select(col("u"), col("t").as("a"), col("ts").as("ta"))
    val r = base.select(col("u"), col("t").as("b"), col("ts").as("tb"))
    l.join(r, Seq("u"))
      .where(col("tb") > col("ta") &&
        col("tb") - col("ta") <= lit(gapSeconds * 1000000L))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }
}
