package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series shaping: most downstream consumers of
  * daily metrics (drift monitors, forecasting features, cohort
  * reports) assume one row per (key, day) — but event-derived
  * aggregates only have rows where events happened. The gap-fill
  * completes the grid and carries values across the holes.
  */
object TimeSeries {

  /** Complete `df` — one row per (`keyCol`, `dateCol`), the caller's
    * pre-aggregated daily frame — to the full key × day grid over the
    * frame's [min, max] date span, then fill the holes: `forward =
    * false` fills with 0 (count-like metrics), `forward = true`
    * carries the last observed value (level-like metrics: balances,
    * totals-to-date); days before a key's first observation stay NULL
    * under forward fill — fabricating a level there would be a lie.
    *
    * Scale shape: the span bounds are ONE collected aggregate (two
    * literals in the plan); the spine is a per-key `sequence` explode
    * — days × keys rows, the size of the OUTPUT, never corpus-shaped;
    * the actuals join is (key, date)-co-keyed; the forward-fill
    * window partitions by key and its group size is bounded by the
    * day span, not the corpus. Output: (keyCol, dateCol, valueCol). */
  /** Trailing `days`-window sum over a REGULAR daily grid (one row
    * per (key, day) — compose after [[gapFill]], which guarantees it;
    * on an irregular frame a rows-window would silently span gaps).
    * The window partitions by key ordered by date, ROWS days-1
    * PRECEDING — group size bounded by the day span. NULL cells
    * (gapFill's leading forward-fill rows) stay NULL-transparent:
    * the window sums the non-NULL cells, both engines alike. */
  def rollingSum(df: DataFrame, keyCol: String, dateCol: String,
                 valueCol: String, days: Int): DataFrame = {
    require(days >= 1, "days must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(-(days - 1), Window.currentRow)
    df.select(col(keyCol), col(dateCol), col(valueCol),
      sum(col(valueCol)).over(w).as(s"rolling_$valueCol"))
  }

  /** Per-key linear trend (OLS slope/intercept) in ONE aggregate —
    * "is this metric drifting up?" per source/priority/domain at any
    * key cardinality: closed-form least squares from the five moment
    * sums (n, Σx, Σy, Σx², Σxy), which are exact integer aggregates
    * with map-side combine; the slope then follows a FIXED float
    * operation order over those exact sums, so the result replays
    * bit-identically before the micro rounding (the q154 discipline).
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept = ȳ − slope·x̄.
    * Keys with n < 2 or constant x emit nothing (no line to fit).
    * `xCol`/`yCol` must be integer-valued (day index, cents).
    * Output: (keyCol, n, slope_micro, intercept_micro). */
  def trendPerKey(df: DataFrame, keyCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"))
    val nd = col("n").cast("double")
    val sxd = col("sx").cast("double")
    val syd = col("sy").cast("double")
    val sxxd = col("sxx").cast("double")
    val sxyd = col("sxy").cast("double")
    val denom = nd * sxxd - sxd * sxd
    val slope = (nd * sxyd - sxd * syd) / denom
    val icept = (syd / nd) - slope * (sxd / nd)
    agg.where(col("n") >= 2 && denom > lit(0.0))
      .select(col(keyCol), col("n"),
        round(lit(1e6) * slope).cast("long").as("slope_micro"),
        round(lit(1e6) * icept).cast("long").as("intercept_micro"))
  }

  /** Trailing-window anomaly detection over a REGULAR daily grid
    * (compose after [[gapFill]]): each day's value is z-scored
    * against the preceding `days` window — EXCLUDING the current day,
    * so a spike can't dilute its own baseline — and days with
    * |z| >= the threshold are flagged. The metric-monitoring staple
    * (did today's volume/revenue/error-count jump?).
    *
    * Exact cross-engine replay despite the float z: window sums of v
    * and v² are exact integer aggregates; mean/variance/z then follow
    * a FIXED operation order, and IEEE sqrt is correctly rounded —
    * bit-identical on both engines — before the single micro
    * rounding. Windows with fewer than `minPoints` observations or
    * zero variance emit nothing (no baseline — no verdict).
    * Output: (keyCol, dateCol, valueCol, z_micro). */
  def anomalies(df: DataFrame, keyCol: String, dateCol: String,
                valueCol: String, days: Int, zThresholdMicro: Long,
                minPoints: Int = 5): DataFrame = {
    require(days >= 2, "days must be >= 2")
    require(minPoints >= 2 && minPoints <= days, "need 2 <= minPoints <= days")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(-days, -1)
    val v = col(valueCol)
    val withStats = df.select(col(keyCol), col(dateCol), v,
      sum(v).over(w).as("__s1"),
      sum(v * v).over(w).as("__s2"),
      count(v).over(w).as("__n"))
    val mean = col("__s1").cast("double") / col("__n")
    val ex2 = col("__s2").cast("double") / col("__n")
    val variance = ex2 - mean * mean
    val zMicro = round(lit(1e6) *
      ((v.cast("double") - mean) / sqrt(variance))).cast("long")
    withStats
      .where(col("__n") >= minPoints && variance > lit(0.0))
      .select(col(keyCol), col(dateCol), v, zMicro.as("z_micro"))
      .where(abs(col("z_micro")) >= zThresholdMicro)
  }

  /** Ordered funnel conversion: how many users reach each step of
    * `steps` IN ORDER — step k counts users with an event of type k
    * strictly after their step-(k-1) time (first-touch semantics:
    * the earliest qualifying event advances the funnel). Set-based:
    * one user-keyed min-aggregate per step joined user-CO-KEYED onto
    * the previous threshold — |steps| passes over the (filtered)
    * event stream, no per-user event list ever materializes. Output:
    * (step, step_name, n_users), monotone non-increasing. */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val s = df.sparkSession
    import s.implicits._
    var cur = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    val counts = Seq.newBuilder[(Long, String, Long)]
    counts += ((1L, steps.head, cur.count()))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      cur = df.where(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("__ts"))
        .join(cur, Seq("u"))
        .where(col("__ts") > col("t"))
        .groupBy("u").agg(min(col("__ts")).as("t"))
      counts += ((i + 1L, st, cur.count()))
    }
    counts.result().toDF("step", "step_name", "n_users")
  }

  /** Cohort retention matrix — the product-analytics staple: users
    * grouped by the week of their FIRST event (the cohort), then for
    * every later week the count of cohort members still active. The
    * output (cohort_week, offset_weeks, n_users) is the retention
    * triangle; read row-wise it answers "how fast does each weekly
    * cohort decay".
    *
    * Scale shape: the first-touch is one user-keyed min aggregate
    * (map-side combined); the join back is user-CO-KEYED (the cohort
    * frame is users-scale — never broadcast blindly, AQE decides);
    * the final (cohort, offset) distinct-count shuffles (cohort,
    * offset, user) keys once. Nothing corpus-shaped hits the driver.
    * Weeks truncate Monday-start (date_trunc semantics shared by
    * Spark and DuckDB), offsets are exact integer day-diffs div 7. */
  def cohortRetention(df: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val e = df.select(col(userCol).as("u"),
      date_trunc("week", col(tsCol)).as("wk"))
    val first = e.groupBy("u").agg(min("wk").as("c0"))
    e.join(first, Seq("u"))
      .select(col("u"), col("c0"),
        expr("datediff(to_date(wk), to_date(c0)) div 7").as("offset_weeks"))
      .groupBy(col("c0").as("cohort_week"), col("offset_weeks"))
      .agg(count_distinct(col("u")).as("n_users"))
  }

  def gapFill(df: DataFrame, keyCol: String, dateCol: String,
              valueCol: String, forward: Boolean): DataFrame = {
    val mm = df.agg(min(col(dateCol)).as("mn"), max(col(dateCol)).as("mx"))
      .head()
    require(!mm.isNullAt(0), "gapFill needs at least one dated row")
    val (mn, mx) = (mm.getDate(0), mm.getDate(1))
    val grid = df.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(mn), lit(mx), expr("interval 1 day")))
          .as(dateCol))
    val joined = grid.join(df, Seq(keyCol, dateCol), "left")
    if (forward) {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined.select(col(keyCol), col(dateCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(valueCol))
    } else {
      joined.select(col(keyCol), col(dateCol),
        coalesce(col(valueCol), lit(0L)).as(valueCol))
    }
  }

  /** Period-over-period deltas on a REGULAR daily grid (compose after
    * [[gapFill]]): each (key, day) row gains the value `lagDays` back,
    * the absolute delta, and the relative change in integer micros —
    * the WoW/MoM reporting staple (lagDays 7 / 28). One lag() on the
    * (key)-window: single shuffle, per-key groups bounded by the day
    * span. Rows with no prior period (the grid's first lagDays days)
    * or a zero/NULL base emit NULL deltas — a fabricated 0% there
    * would be a lie, same contract as gapFill's leading NULLs. The
    * pct is round(1e6·(v − prev)/prev) over exact longs in fixed
    * order. Output: input cols + (prev_value, delta, pct_micro). */
  def periodDelta(df: DataFrame, keyCol: String, dateCol: String,
                  valueCol: String, lagDays: Int): DataFrame = {
    require(lagDays >= 1, "lagDays must be >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    val v = col(valueCol).cast("long")
    df.withColumn("prev_value", lag(v, lagDays).over(w))
      .withColumn("delta", v - col("prev_value"))
      .withColumn("pct_micro",
        when(col("prev_value").isNotNull && col("prev_value") =!= 0L,
          round(lit(1e6) * (v - col("prev_value")).cast("double")
            / col("prev_value").cast("double")).cast("long")))
  }

  /** Per-key exponential smoothing in EXACT INTEGER arithmetic,
    * α = 1/2: fold e ← (e + x) div 2 over the key's series in
    * (`tsCol`) order, x in non-negative milli-units (`milliCol`).
    * Halving in longs makes every step exact and engine-replayable —
    * a float EWMA's (1−α)ⁿ tail is fp-order-sensitive; this one is a
    * pure integer recurrence (the pagerankInt discipline applied to a
    * fold). Truncation bias is ≤ 1 milli-unit per step, deterministic.
    * Requires non-negative values and unique ts per key (`div`
    * truncates toward zero but `//`-floor engines differ on
    * negatives; ties would make the fold order ambiguous).
    *
    * Scale shape: ONE map-side-combinable... no — collect_list is the
    * honest caveat: the fold is inherently sequential, so the key's
    * full series is assembled (sort_array + aggregate) on one
    * executor. Per-ENTITY series (a user's events, an item's daily
    * sales) are bounded and this is fine at any corpus size; do not
    * point it at a single corpus-wide key. That bound is ENFORCED:
    * a cheap map-combined count pass rides in as a broadcast scalar,
    * and any key over `maxPerKey` rows raises BEFORE the partial
    * aggregates start assembling lists (the guard lives inside the
    * collected value expression, so pruning can't drop it) — an OOM
    * hours into a corpus-scale job becomes an immediate, named error.
    * Unbounded series belong to the streaming twin
    * ([[graft.streaming.StreamTimeSeries.ewmaStream]]). Output:
    * (key, n, ewma_milli). */
  def ewmaHalfPerKey(df: DataFrame, keyCol: String, tsCol: String,
                     milliCol: String, maxPerKey: Long = 1L << 22): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    val biggest = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .agg(coalesce(max("__n"), lit(0L)).as("__mx"))
    val v = when(col("__mx") > maxPerKey,
      raise_error(concat(lit("ewmaHalfPerKey: a key holds "), col("__mx"),
        lit(s" rows > maxPerKey=$maxPerKey; the sequential fold would" +
          " assemble that series on one task. Use StreamTimeSeries" +
          ".ewmaStream for unbounded series, or raise maxPerKey."))).cast("long"))
      .otherwise(col(milliCol).cast("long"))
    df.crossJoin(broadcast(biggest))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("t"), v.as("v")))).as("sr"))
      .select(col(keyCol), size(col("sr")).cast("long").as("n"),
        expr("aggregate(sr, CAST(NULL AS BIGINT), (acc, e) -> " +
          "CASE WHEN acc IS NULL THEN e.v ELSE (acc + e.v) div 2 END)")
          .as("ewma_milli"))
  }

  /** Lag-k Pearson autocorrelation of each key's daily measure — the
    * seasonality/burstiness screen over a metric grid (lag 1: is
    * today's volume predictive of tomorrow's? lag 7: weekly cycle?).
    * Works on the PAIRED series: day d joined to day d + lag per key
    * — an arithmetic equi-join on (key, date), no windows, no
    * collect_list, so a key's cost is its day count and the plan is
    * two shuffles (daily aggregate, pair join) regardless of how hot
    * a key is. Input is event-level; the measure is count(*) per
    * (key, day). Pearson r over the pairs from exact integer moments
    * (Σx, Σy, Σxy, Σx², Σy² — products through DECIMAL(38,0)), then
    * one fixed-order float expression → bit-stable micros. Keys with
    * < 2 pairs or zero variance on either side emit NULL r.
    * Output: (key, n_pairs, r_micro). */
  def lagCorrDaily(df: DataFrame, keyCol: String, tsCol: String,
                   lag: Int = 1): DataFrame = {
    require(lag >= 1, s"lag must be >= 1, got $lag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("v"))
    val a = daily.select(col("key"), col("d"), col("v").as("x"))
    val b = daily.select(col("key"), date_sub(col("d"), lag).as("d"),
      col("v").as("y"))
    val pairs = a.join(b, Seq("key", "d"))
    val m = pairs.groupBy("key").agg(
      count(lit(1)).as("np"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
    def d(c: String) = col(c).cast("double")
    val n = d("np")
    val cov = d("sxy") - d("sx") * d("sy") / n
    val vx = d("sxx") - d("sx") * d("sx") / n
    val vy = d("syy") - d("sy") * d("sy") / n
    m.select(col("key"), col("np").as("n_pairs"),
      when(col("np") >= 2 && vx > 0 && vy > 0,
        round(cov / sqrt(vx * vy) * 1e6).cast("long")).as("r_micro"))
  }
}
