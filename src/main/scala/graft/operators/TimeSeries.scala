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

  /** Holt double exponential smoothing (Holt 1957) with α = β = ½ in
    * EXACT integer milli-units — [[ewmaHalfPerKey]]'s in-row fold
    * extended to a (level, trend) state:
    *   l′ = trunc((v + l + b) / 2),  b′ = trunc((b + (l′ − l)) / 2)
    * (init l = v₁, b = 0). Every halving TRUNCATES TOWARD ZERO on
    * both engines (Spark `div` and DuckDB `//` both truncate —
    * measured, not assumed: a floor formulation via shiftright
    * diverged on the first declining series). The level+trend
    * forecast primitive where ewma alone lags a drifting series.
    *
    * The (level, trend) state is PACKED into one offset BIGINT
    * ((l + 2³⁰)·2³¹ + (b + 2³⁰)) instead of a struct: DuckDB's
    * list_reduce evaluates struct-literal fields against an
    * accumulator it updates IN PLACE — the second field's expression
    * sees the first field's NEW value — so a struct-state fold
    * silently diverges between engines; a scalar state cannot.
    * Values must satisfy |v| < 2²⁹ milli-units (≈ ±5·10⁸ —
    * guard-raised), which bounds |l|, |b| the same way (the fold is
    * a convex-combination recurrence). The 2²⁹ bound — HALF the 2³⁰
    * packing offset — keeps every packed state ≥ (2³⁰−2²⁹)·2³¹ = 2⁶⁰,
    * so the oracle's raw-first-element vs packed-state disambiguation
    * (`a < 2⁴⁰`) can never misread a packed state whose level sits
    * near the −2³⁰ packing bound as a raw element.
    *
    * Same scale posture as ewmaHalfPerKey: one key-partitioned
    * collect of (ts, v) structs, the fold runs in-row; `maxPerKey`
    * raises before any key assembles an unbounded series on one
    * task. Output: (key, n, level_milli, trend_milli). */
  def holtHalfPerKey(df: DataFrame, keyCol: String, tsCol: String,
                     milliCol: String, maxPerKey: Long = 1L << 22): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    val guards = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), max(abs(col(milliCol))).as("__a"))
      .agg(coalesce(max("__n"), lit(0L)).as("__mx"),
        coalesce(max("__a"), lit(0L)).as("__mxa"))
    val v = when(col("__mx") > maxPerKey,
      raise_error(concat(lit("holtHalfPerKey: a key holds "), col("__mx"),
        lit(s" rows > maxPerKey=$maxPerKey; the sequential fold would" +
          " assemble that series on one task."))).cast("long"))
      .when(col("__mxa") >= lit(1L << 29),
        raise_error(lit("holtHalfPerKey: |value| must be < 2^29 " +
          "milli-units (packed-state bound with margin for the " +
          "oracle's raw-vs-packed disambiguation)")).cast("long"))
      .otherwise(col(milliCol).cast("long"))
    // C = 2^30 offset, M = 2^31 radix; packed = (l+C)*M + (b+C)
    df.crossJoin(broadcast(guards))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("t"), v.as("v")))).as("sr"))
      .select(col(keyCol), size(col("sr")).cast("long").as("n"),
        expr("""aggregate(sr, CAST(NULL AS BIGINT),
          |  (acc, e) -> CASE
          |    WHEN acc IS NULL THEN
          |      (e.v + 1073741824L) * 2147483648L + 1073741824L
          |    ELSE
          |      (((e.v + ((acc div 2147483648L) - 1073741824L)
          |          + ((acc % 2147483648L) - 1073741824L)) div 2)
          |        + 1073741824L) * 2147483648L
          |      + (((((acc % 2147483648L) - 1073741824L)
          |          + (((e.v + ((acc div 2147483648L) - 1073741824L)
          |              + ((acc % 2147483648L) - 1073741824L)) div 2)
          |             - ((acc div 2147483648L) - 1073741824L))) div 2)
          |        + 1073741824L)
          |    END)""".stripMargin).as("st"))
      .select(col(keyCol), col("n"),
        (expr("st div 2147483648L") - lit(1073741824L)).as("level_milli"),
        (expr("st % 2147483648L") - lit(1073741824L)).as("trend_milli"))
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978, "On a measure of
    * lack of fit in time series models") over each key's daily event
    * counts: Q = n(n+2)·Σ_{k≤K} r_k²/m_k — "is this series white
    * noise, or does SOME autocorrelation structure exist?" — the
    * one-number screen before fitting anything seasonal
    * ([[lagCorrDaily]] inspects one lag; this pools K).
    *
    * Conventions (explicit, since ACF variants differ): r_k is the
    * Pearson correlation of the OBSERVED day pairs (d, d+k) against
    * the full-series mean and variance — on a complete grid this is
    * the textbook sample ACF with m_k = n − k pairs; with holes the
    * pair set (and m_k) shrinks to what is observed (compose after
    * [[gapFill]] for strict regularity). Per-lag terms r_k²·10⁶/m_k
    * are micro-rounded from exact integer moments and one fixed
    * float order, then Q_micro = n(n+2)·Σ terms is pure integer
    * arithmetic (q219 discipline).
    *
    * Scale shape: one daily aggregate (persisted — K lag joins read
    * it), K (key, day)-co-keyed self-joins each producing key-scale
    * moment rows, and metadata-scale closes.
    * Output: (key, n, k_lags, q_micro); keys with n ≤ maxLag or zero
    * variance emit NULL q_micro. */
  def ljungBox(df: DataFrame, keyCol: String, tsCol: String,
               maxLag: Int = 4): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val daily = df
      .groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(col("key"),
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01")))
          .cast("long").as("d"),
        col("x"))
      .persist(lvl)
    val g = daily.groupBy("key").agg(count(lit(1)).as("n"),
      sum("x").as("s1"), sum(col("x") * col("x")).as("s2"))
    val lagStats = (1 to maxLag).map { k =>
      daily.as("a").join(daily.as("b"),
          col("a.key") === col("b.key") &&
            col("b.d") === col("a.d") + lit(k.toLong))
        .groupBy(col("a.key").as("key"))
        .agg(count(lit(1)).as("m"),
          sum(col("a.x") * col("b.x")).as("sxy"),
          sum(col("a.x")).as("sh"), sum(col("b.x")).as("st"))
        .withColumn("lag", lit(k.toLong))
    }.reduce(_ unionByName _)
    def d(c: String) = col(c).cast("double")
    val xbar = d("s1") / d("n")
    val num = d("sxy") - xbar * (d("sh") + d("st")) +
      d("m") * xbar * xbar
    val den = d("s2") - d("n") * xbar * xbar
    val r = num / den
    val term = round(r * r * 1e6 / d("m")).cast("long")
    lagStats.join(g, Seq("key"))
      .where(col("m") > 0)
      .groupBy("key")
      .agg(max("n").as("n"), count(lit(1)).as("k_lags"),
        sum(when(den > 0, term)).as("tsum"))
      .select(col("key"), col("n"), col("k_lags"),
        when(col("n") > lit(maxLag.toLong) && col("tsum").isNotNull,
          col("n") * (col("n") + lit(2L)) * col("tsum"))
          .as("q_micro"))
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

  /** Von Neumann ratio (von Neumann 1941, "Distribution of the ratio
    * of the mean square successive difference to the variance") of
    * each key's daily event counts:
    *   η = Σ_{t}(x_{t+1} − x_t)² / Σ(x_t − x̄)²
    * — the classic randomness / trend screen: η ≈ 2 for white noise,
    * → 0 under positive serial correlation (trend), → 4 under
    * alternation. The Durbin–Watson statistic is this ratio computed
    * on regression residuals; on raw counts it answers "is this
    * series even worth a trend fit?" one step before [[trendPerKey]].
    *
    * Successive pairs are consecutive CALENDAR days with both
    * observed (the [[lagCorrDaily]] convention — compose after
    * [[gapFill]] for strict regularity). Both sums close from exact
    * DECIMAL integer moments; η_micro = round(1e6·n·Σd² /
    * (n·Σx² − (Σx)²)) in one double division. Output: (key, n,
    * n_pairs, vn_micro — NULL when the variance is 0 or n < 2). */
  def vonNeumannRatio(df: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("v"))
      .localCheckpoint(false)
    val a = daily.select(col("key"), col("d"), col("v").as("x"))
    val b = daily.select(col("key"), date_sub(col("d"), 1).as("d"),
      col("v").as("y"))
    val diffs = a.join(b, Seq("key", "d"))
      .groupBy("key").agg(count(lit(1)).as("n_pairs"),
        coalesce(sum((col("y").cast(dec) - col("x").cast(dec))
          * (col("y").cast(dec) - col("x").cast(dec))), lit(0).cast(dec))
          .as("sd2"))
    val moms = daily.groupBy("key").agg(count(lit(1)).as("n"),
      sum(col("v").cast(dec)).as("sx"),
      sum(col("v").cast(dec) * col("v").cast(dec)).as("sxx"))
    def d2(c: String) = col(c).cast("double")
    moms.join(diffs, Seq("key"), "left")
      .select(col("key"), col("n"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("n") >= 2 &&
          d2("n") * d2("sxx") - d2("sx") * d2("sx") > 0,
          round(d2("n") * coalesce(d2("sd2"), lit(0.0))
            / (d2("n") * d2("sxx") - d2("sx") * d2("sx")) * 1e6)
            .cast("long")).as("vn_micro"))
  }

  /** Wald–Wolfowitz runs test (1940) per key over daily event
    * counts: binarize each day as above/below the key's MEAN (the
    * exact integer comparison v·n ≷ Σv — no float cutpoint; days
    * exactly AT the mean drop, the standard tie convention), count
    * the runs R over the day-ordered sequence, and close
    *   z = (R − E[R]) / √Var,  E[R] = 2·n₁n₂/n + 1,
    *   Var = 2n₁n₂(2n₁n₂ − n) / (n²(n − 1))
    * — "do high and low days CLUSTER?" — the sign-based randomness
    * screen beside [[vonNeumannRatio]]'s magnitude-based one. R is
    * exact (a key-partitioned lag over the observed day order); one
    * fixed-order float close. Output: (key, n, n_above, n_below,
    * runs, z_micro — NULL when either side is empty or n < 2). */
  def runsTest(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = df.groupBy(col(keyCol).as("key"),
        to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("v"))
      .localCheckpoint(false)
    val stats = daily.groupBy("key")
      .agg(count(lit(1)).as("nd"), sum(col("v").cast(dec)).as("sv"))
    val signed = daily.join(stats, Seq("key"))
      .where(col("v").cast(dec) * col("nd") =!= col("sv"))
      .select(col("key"), col("d"),
        (col("v").cast(dec) * col("nd") > col("sv")).as("hi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("d")
    val runs = signed
      .withColumn("__chg",
        when(lag(col("hi"), 1).over(w).isNull ||
          lag(col("hi"), 1).over(w) =!= col("hi"), 1L).otherwise(0L))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("hi"), 1L).otherwise(0L)), lit(0L)).as("n_above"),
        coalesce(sum(when(!col("hi"), 1L).otherwise(0L)), lit(0L)).as("n_below"),
        coalesce(sum("__chg"), lit(0L)).as("runs"))
    def d2(c: String) = col(c).cast("double")
    val p = lit(2.0) * d2("n_above") * d2("n_below")
    val er = p / d2("n") + lit(1.0)
    val vr = p * (p - d2("n")) / (d2("n") * d2("n") * (d2("n") - lit(1.0)))
    runs.select(col("key"), col("n"), col("n_above"), col("n_below"),
      col("runs"),
      when(col("n_above") >= 1 && col("n_below") >= 1 && col("n") >= 2 &&
        vr > 0,
        round((d2("runs") - er) / sqrt(vr) * 1e6).cast("long"))
        .as("z_micro"))
  }

  /** Peak concurrency per key over half-open intervals [start, end) —
    * the capacity statistic (max simultaneous sessions, peak open
    * connections). Classic sweep line: +1 at start, −1 at end, peak =
    * max prefix of the ordered deltas. Half-open means an interval
    * ending exactly when another starts never overlaps it, which the
    * per-timestamp collapse encodes for free: within one timestamp the
    * ends all land before the starts, so the interior dip never
    * exceeds a neighbor and the max over prefixes equals the max over
    * per-timestamp NET cumulative sums.
    *
    * Skew posture (the [[Stats.giniByKey]] two-phase): timestamps
    * bucket by global percentiles, each (key, bucket) computes its
    * local ordered prefix maximum and subtotal, bucket offsets come
    * from a per-key window over ≤ p rows, and the peak is
    * max(offset + local max) — a hot key spreads across all p
    * partitions; no per-key window ever sees row-scale data.
    * Output: (key, n_intervals, max_concurrent). Rows with NULL
    * start/end are dropped; end < start is rejected by filter (an
    * inverted interval would silently corrupt the sweep). */
  def maxConcurrent(df: DataFrame, keyCol: String, startCol: String,
                    endCol: String): DataFrame = {
    val iv = df.select(col(keyCol).as("key"),
        unix_micros(col(startCol)).as("s"), unix_micros(col(endCol)).as("e"))
      .where(col("s").isNotNull && col("e").isNotNull && col("s") <= col("e"))
    val nIv = iv.groupBy("key").agg(count(lit(1)).as("n_intervals"))
    val deltas = iv.select(col("key"), col("s").as("t"), lit(1L).as("dl"))
      .unionByName(iv.select(col("key"), col("e").as("t"),
        lit(-1L).as("dl")))
    val perT = deltas.groupBy("key", "t").agg(sum("dl").as("net"))
    nIv.join(peakOverDeltas(perT), Seq("key"))
      .select(col("key"), col("n_intervals"), col("max_concurrent"))
  }

  /** Max prefix of per-timestamp NET deltas, per key — the sweep-line
    * core shared by [[maxConcurrent]] and the streaming concurrency
    * monitor ([[graft.streaming.StreamMonitor.concurrencyStream]]).
    * Input: (key, t, net) with at most one row per (key, t); output:
    * (key, max_concurrent ≥ 0). The two-phase bucket/offset shape is
    * documented on [[maxConcurrent]]. */
  private[graft] def peakOverDeltas(perT: DataFrame): DataFrame = {
    val p = math.max(1,
      perT.sparkSession.sessionState.conf.numShufflePartitions)
    val bucketed =
      if (p == 1) perT.withColumn("__b", lit(0))
      else {
        val bnds = perT.agg(percentile_approx(col("t").cast("double"),
          typedlit((1 until p).map(_.toDouble / p)), lit(10000)).as("__bnds"))
        perT.crossJoin(broadcast(bnds))
          .withColumn("__b", size(filter(col("__bnds"),
            b => b < col("t").cast("double"))))
          .drop("__bnds")
      }
    val wLoc = Window.partitionBy("key", "__b").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__pre", sum("net").over(wLoc))
      .groupBy("key", "__b")
      .agg(sum("net").as("__bsum"), max("__pre").as("__bmax"))
    val wOff = Window.partitionBy("key").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("__off", coalesce(sum("__bsum").over(wOff), lit(0L)))
      .groupBy("key")
      .agg(greatest(max(col("__off") + col("__bmax")), lit(0L))
        .as("max_concurrent"))
  }

  /** CUSUM changepoint per key over the daily count series: the day
    * where the cumulative deviation from a flat rate peaks — the
    * standard "when did the level shift?" detector for volume drops
    * and launches. Pure integer form: with D days, total T and prefix
    * P_i at the i-th day (ascending), the scaled statistic
    *   S_i = P_i·D − i·T   (= D·T·CUSUM_i in the usual normalization)
    * never touches a float; the changepoint is the day maximizing
    * |S_i|, ties → earliest day. S_D = 0 by construction, so a
    * perfectly flat series reports its first day with s_abs_max = 0.
    *
    * Per-key windows order by day — group size is calendar-bounded
    * (the [[lagCorrDaily]] bound), not corpus-bounded. Products go
    * through DECIMAL(38,0) (P·D and i·T can pass 2⁶³ on wide spans ×
    * heavy days). Output: (key, n_days, total, cp_date, s_abs_max). */
  def cusumChangepoint(df: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val daily = df.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("c"))
      .where(col("d").isNotNull)
    val wSeq = Window.partitionBy("key").orderBy("d")
    val wAll = Window.partitionBy("key")
    val scored = daily
      .withColumn("__i", row_number().over(wSeq).cast("long"))
      .withColumn("__p", sum("c").over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__nd", count(lit(1)).over(wAll))
      .withColumn("__t", sum("c").over(wAll))
      .withColumn("__s", abs(col("__p").cast(dec) * col("__nd").cast(dec)
        - col("__i").cast(dec) * col("__t").cast(dec)))
    val wPick = Window.partitionBy("key")
      .orderBy(col("__s").desc, col("d").asc)
    scored.withColumn("__rn", row_number().over(wPick))
      .where(col("__rn") === 1)
      .select(col("key"), col("__nd").as("n_days"), col("__t").as("total"),
        col("d").as("cp_date"), col("__s").cast("long").as("s_abs_max"))
  }

  /** Exact sliding-window distinct count per (key, day) — trailing
    * `days`-day distinct actives (7-day unique users, 28-day unique
    * repos), the metric COUNT(DISTINCT) over a sliding window cannot
    * express scalably because per-day distinct sets are not additive.
    *
    * The range-delta reformulation makes it one pass: dedup to
    * (key, id, day) occurrences, lag() gives each occurrence its
    * predecessor day for the same (key, id), and an occurrence at day
    * t with predecessor p is the COUNTED representative of its id
    * exactly for window-end days d ∈ [max(t, p + days), t + days − 1]
    * (before that the predecessor is still inside the window; after
    * it the occurrence has slid out). Each occurrence thus becomes a
    * +1/−1 day-range delta; per-(key, day) nets prefix-sum to the
    * exact distinct count. No window ever touches an id set — the
    * lag window is bounded by one id's day count, the prefix window
    * by the calendar ([[lagCorrDaily]] bound).
    *
    * The emit grid is the global [min, max] day span per key
    * (gapFill's span posture: two collected literals, a per-key
    * sequence explode), count 0 before a key's first active window.
    * Output: (key, d — epoch day, n_distinct). */
  def slidingDistinct(df: DataFrame, keyCol: String, idCol: String,
                      tsCol: String, days: Int): DataFrame = {
    require(days >= 1, s"need days >= 1, got $days")
    val occ = df
      .select(col(keyCol).as("key"), col(idCol).as("id"),
        unix_date(col(tsCol).cast("date")).cast("long").as("t"))
      .where(col("t").isNotNull)
      .distinct()
    val wPrev = Window.partitionBy("key", "id").orderBy("t")
    val contrib = occ
      .withColumn("__prev", lag("t", 1).over(wPrev))
      .select(col("key"),
        greatest(col("t"), coalesce(col("__prev") + days, col("t")))
          .as("lo"),
        (col("t") + days - 1).as("hi"))
    val net = contrib.select(col("key"), col("lo").as("d"),
        lit(1L).as("dl"))
      .unionByName(contrib.select(col("key"), (col("hi") + 1).as("d"),
        lit(-1L).as("dl")))
      .groupBy("key", "d").agg(sum("dl").as("net"))
    val wRun = Window.partitionBy("key").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = net.withColumn("cnt", sum("net").over(wRun))
      .select("key", "d", "cnt")
    val mm = occ.agg(min("t").as("mn"), max("t").as("mx")).head()
    require(!mm.isNullAt(0), "slidingDistinct needs at least one dated row")
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    val grid = occ.select("key").distinct()
      .select(col("key"), explode(sequence(lit(mn), lit(mx))).as("d"))
    val wFill = Window.partitionBy("key").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(run, Seq("key", "d"), "left")
      .select(col("key"), col("d"),
        coalesce(last("cnt", ignoreNulls = true).over(wFill), lit(0L))
          .as("n_distinct"))
  }

  /** Day-of-week seasonal profile per key — the multiplicative
    * decomposition step forecasting and anomaly pipelines run before
    * comparing a Monday to a Sunday: per (key, dow) the day count,
    * the exact mean daily volume (integer micro division — sums and
    * counts are non-negative, so truncate == floor on every engine),
    * and the seasonal index (dow mean / overall mean) in one
    * fixed-order float expression. Day-of-week is PURE ARITHMETIC —
    * (epoch_day + 4) mod 7, 0 = Sunday — because dayofweek()
    * conventions differ across engines (1-based Sunday-first vs
    * 0-based) and an off-by-one here silently shifts every index.
    * Output: (key, dow, n_days, mean_micro, index_micro). */
  def seasonalProfile(df: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol).as("key"),
        unix_date(col(tsCol).cast("date")).cast("long").as("d"))
      .where(col("d").isNotNull)
      .groupBy("key", "d").agg(count(lit(1)).as("v"))
      .withColumn("dow", pmod(col("d") + 4, lit(7L)))
    val byDow = daily.groupBy("key", "dow")
      .agg(count(lit(1)).as("n_days"), sum("v").as("sd"))
    val byKey = daily.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    def d(c: String) = col(c).cast("double")
    byDow.join(byKey, Seq("key"))
      .select(col("key"), col("dow"), col("n_days"),
        expr("(sd * 1000000L) div n_days").as("mean_micro"),
        when(col("s") > 0,
          round((d("sd") / d("n_days")) / (d("s") / d("n")) * 1e6)
            .cast("long")).as("index_micro"))
  }

  /** Segmented trend around the CUSUM changepoint — the follow-up
    * question after [[cusumChangepoint]] says WHEN the level shifted:
    * what were the slopes BEFORE (day ≤ changepoint) and AFTER? One
    * daily aggregate tagged by segment, the five exact OLS moments
    * per (key, segment) ([[trendPerKey]]'s closed form and float
    * order), pivoted to one row per key. Segments with < 2 days or
    * constant x emit NULL slope. Output: (key, cp_date, n_before,
    * slope_before_micro, n_after, slope_after_micro). */
  def segmentedTrend(df: DataFrame, keyCol: String,
                     tsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cp = cusumChangepoint(df, keyCol, tsCol).select("key", "cp_date")
    val daily = df.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("v"))
      .where(col("d").isNotNull)
    val tagged = daily.join(cp, Seq("key"))
      .withColumn("seg", when(col("d") <= col("cp_date"), lit("b"))
        .otherwise(lit("a")))
      .withColumn("x", unix_date(col("d")).cast("long"))
    val m = tagged.groupBy("key", "cp_date", "seg").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("v").as("sy"),
      sum(col("x").cast(dec) * col("v").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    def d(c: String) = col(c).cast("double")
    val den = d("n") * d("sxx") - d("sx") * d("sx")
    val slope = when(col("n") >= 2 && den > 0,
      round((d("n") * d("sxy") - d("sx") * d("sy")) / den * 1e6)
        .cast("long"))
    val scored = m.select(col("key"), col("cp_date"), col("seg"),
      col("n"), slope.as("slope_micro"))
    def pick(c: String, s: String) =
      first(when(col("seg") === s, col(c)), ignoreNulls = true)
    scored.groupBy("key", "cp_date").agg(
      coalesce(pick("n", "b"), lit(0L)).as("n_before"),
      pick("slope_micro", "b").as("slope_before_micro"),
      coalesce(pick("n", "a"), lit(0L)).as("n_after"),
      pick("slope_micro", "a").as("slope_after_micro"))
  }

  /** Trailing OLS slope per (key, day) over the last `days` rows of a
    * REGULAR daily grid (compose after [[gapFill]], same contract as
    * [[rollingSum]]) — the local trend feature forecasting pipelines
    * attach to every day. The five moment sums run as ONE set of
    * trailing windows (exact integers, x = epoch day, products through
    * DECIMAL(38,0)); the slope is the [[trendPerKey]] closed form in
    * fixed float order over those exact sums → bit-stable micros.
    * Rows whose trailing window holds < 2 non-NULL points (or constant
    * x — impossible on a daily grid, kept for safety) emit NULL.
    * Window group size is day-span-bounded. Output: (key, date,
    * value, slope_micro). */
  def rollingSlope(df: DataFrame, keyCol: String, dateCol: String,
                   valueCol: String, days: Int): DataFrame = {
    require(days >= 2, s"need days >= 2 for a slope, got $days")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(-(days - 1), Window.currentRow)
    val x = unix_date(col(dateCol).cast("date")).cast("long")
    val y = col(valueCol).cast("long")
    // __-prefixed moment aliases: the caller's value column may
    // itself be named n/sx/...
    val base = df.select(col(keyCol), col(dateCol), col(valueCol),
      count(y).over(w).as("__n"),
      sum(when(y.isNotNull, x)).over(w).as("__sx"), sum(y).over(w).as("__sy"),
      sum(x.cast(dec) * y.cast(dec)).over(w).as("__sxy"),
      sum(when(y.isNotNull, x.cast(dec) * x.cast(dec))).over(w).as("__sxx"))
    def d(c: String) = col(c).cast("double")
    val den = d("__n") * d("__sxx") - d("__sx") * d("__sx")
    val num = d("__n") * d("__sxy") - d("__sx") * d("__sy")
    base.select(col(keyCol), col(dateCol), col(valueCol),
      when(col("__n") >= 2 && den > 0,
        round(num / den * 1e6).cast("long")).as("slope_micro"))
  }
}
