package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Comparative statistics over experiment strata: the measurement
  * side of a data pipeline (A/B readouts, Pareto-efficient configs).
  * Everything follows the exact-integer-moments discipline
  * ([[TimeSeries.trendPerKey]]): aggregates are exact (longs /
  * decimals with map-side combine), the float formula over them has a
  * FIXED operation order, so results replay bit-identically across
  * engines.
  */
object Stats {

  /** Welch's unequal-variance z statistic per stratum: group A vs
    * group B on an integer-valued measure (`milliCol` — pre-scale
    * doubles to milli-units upstream so the moments stay exact).
    * One aggregate computes (n, Σx, Σx²) per (stratum, group) —
    * Σx² through DECIMAL(38,0), immune to long overflow and to
    * partial-agg order — then the pivot to A/B columns and
    *   z = (m_A − m_B) / √(v_A/n_A + v_B/n_B)
    * run per stratum-row in fixed order. Sample variance (n−1);
    * strata where either group has n < 2 or zero variance emit NULL z
    * rather than a fake infinity.
    *
    * Scale shape: one map-side-combined shuffle on (stratum, group) —
    * moments, never rows, cross the wire; the pivot is a groupBy on
    * stratum over 2 rows/stratum. Output: (stratum, n_a, n_b,
    * mean_diff_micro, z_micro). */
  def welchZ(df: DataFrame, stratumCol: String, groupCol: String,
             groupA: String, groupB: String, milliCol: String): DataFrame = {
    val m = df
      .where(col(groupCol).isin(groupA, groupB))
      .groupBy(col(stratumCol).as("stratum"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col(milliCol).cast("long")).as("s"),
        sum(col(milliCol).cast(DecimalType(38, 0))
          * col(milliCol).cast(DecimalType(38, 0))).as("ss"))
    def pick(c: String, g: String) =
      first(when(col("g") === g, col(c)), ignoreNulls = true)
    val piv = m.groupBy("stratum").agg(
      pick("n", groupA).as("n_a"), pick("s", groupA).as("s_a"),
      pick("ss", groupA).as("ss_a"),
      pick("n", groupB).as("n_b"), pick("s", groupB).as("s_b"),
      pick("ss", groupB).as("ss_b"))
    // fixed float order over the exact moments (milli → units = /1e3;
    // variance in milli² → micro-var via /1e6 happens inside the z)
    def mean(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    def variance(ss: String, s: String, n: String) =
      (col(ss).cast("double")
        - col(s).cast("double") * col(s).cast("double") / col(n).cast("double")) /
        (col(n).cast("double") - lit(1.0))
    val z = (mean("s_a", "n_a") - mean("s_b", "n_b")) /
      sqrt(variance("ss_a", "s_a", "n_a") / col("n_a").cast("double")
        + variance("ss_b", "s_b", "n_b") / col("n_b").cast("double"))
    piv
      .where(col("n_a").isNotNull && col("n_b").isNotNull)
      .select(col("stratum"), col("n_a"), col("n_b"),
        round((mean("s_a", "n_a") - mean("s_b", "n_b")) * 1000).cast("long")
          .as("mean_diff_micro"),
        when(col("n_a") >= 2 && col("n_b") >= 2,
          round(z * 1e6).cast("long")).as("z_micro"))
  }

  /** Gini concentration per key over an integer measure — the
    * mixture-audit statistic: how unevenly are tokens (bytes, docs)
    * distributed across a source's documents? 0 = perfectly even,
    * →1 = one document holds everything. The rank formulation
    *   G = (2·Σ i·x_i) / (n·Σx) − (n+1)/n,   x ascending, i = 1..n
    * never materializes per-row ranks: a tie run of c rows on value x
    * with o smaller rows before it contributes x·(c·o + c(c+1)/2)
    * regardless of within-tie order (`idCol` kept for API stability —
    * the statistic is provably tie-order invariant), so everything
    * runs over DISTINCT (key, value) counts.
    *
    * Skew posture (the mixture-audit hot key IS one giant source):
    * no (key)-partitioned window ever sees row- or pair-scale data.
    * Prefix counts o are two-phase — global value-range buckets from
    * distinct-pair percentiles (equal values share a bucket, so
    * bucket order == value order and in-bucket windows stay
    * ~pairs/p); per-(key,bucket) subtotals give per-key bucket
    * offsets over ≤ p rows/key; the in-bucket prefix is local to the
    * (key,bucket) partition. A hot key therefore spreads across all
    * p partitions. Moments are exact (Σx·c as long, value×count×rank
    * products through DECIMAL(38,0); c(c+1)/2 halves the even factor
    * BEFORE multiplying so the triangular number never rounds); the
    * final float math runs per key-row in fixed order over identical
    * integers → bit-stable micros. Keys with Σx = 0 are dropped
    * (Gini undefined). Output: (key, n, total, gini_micro). */
  def giniByKey(df: DataFrame, keyCol: String, valueCol: String,
                idCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val grouped = df
      .select(col(keyCol).as("key"), col(valueCol).cast("long").as("x"))
      .groupBy("key", "x").agg(count(lit(1)).as("c"))
    val ranked = prefixCounts(grouped)
    // tie-run rank sum c·o + c(c+1)/2; shiftright halves the even
    // factor exactly (c and o are non-negative counts)
    val tri = when(pmod(col("c"), lit(2L)) === 0L,
      shiftright(col("c"), 1).cast(dec) * (col("c") + 1).cast(dec))
      .otherwise(col("c").cast(dec) * shiftright(col("c") + 1, 1).cast(dec))
    val agg = ranked.groupBy("key").agg(
      sum("c").as("n"),
      sum(col("x").cast(dec) * col("c").cast(dec)).cast("long").as("total"),
      sum(col("x").cast(dec)
        * (col("c").cast(dec) * col("o").cast(dec) + tri)).as("s2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    agg.where(col("total") > 0)
      .select(col("key"), col("n"), col("total"),
        round((lit(2.0) * d(col("s2")) / (d(col("n")) * d(col("total")))
          - (d(col("n")) + lit(1.0)) / d(col("n"))) * 1e6)
          .cast("long").as("gini_micro"))
  }

  /** Per-(key, value) strict-prefix row counts — the shared skew
    * posture of [[giniByKey]] / [[spearmanByKey]]: input is DISTINCT
    * (key, x) rows with multiplicity c; output adds o = number of rows
    * of the key with strictly smaller x. Two-phase: global value-range
    * buckets from distinct-pair percentiles (equal values share a
    * bucket, so bucket order == value order), per-(key, bucket)
    * subtotals give per-key bucket offsets over ≤ p rows/key, and the
    * in-bucket prefix is local to the (key, bucket) partition — a hot
    * key spreads across all p partitions instead of serializing onto
    * one task. NULL x sorts first (bucket 0, nulls-first in-bucket);
    * callers decide whether its contribution survives their sums. */
  private[operators] def prefixCounts(grouped: DataFrame): DataFrame = {
    val p = math.max(1,
      grouped.sparkSession.sessionState.conf.numShufflePartitions)
    val bucketed =
      if (p == 1) grouped.withColumn("__b", lit(0))
      else {
        val bnds = grouped.agg(percentile_approx(col("x").cast("double"),
          typedlit((1 until p).map(_.toDouble / p)), lit(10000)).as("__bnds"))
        grouped.crossJoin(broadcast(bnds))
          .withColumn("__b", size(filter(col("__bnds"),
            b => b < col("x").cast("double"))))
          .drop("__bnds")
      }
    val perBucket = bucketed.groupBy("key", "__b").agg(sum("c").as("__bc"))
    val wOff = Window.partitionBy("key").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__off", coalesce(sum("__bc").over(wOff), lit(0L)))
      .select("key", "__b", "__off")
    val wLoc = Window.partitionBy("key", "__b").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offsets, Seq("key", "__b"))
      .withColumn("o", col("__off") + coalesce(sum("c").over(wLoc), lit(0L)))
      .drop("__bc")
  }

  /** Spearman rank correlation per key between two integer measures —
    * the monotone-association screen (does quality score track token
    * count?) robust to any monotone rescaling. Ties get average ranks;
    * to keep every moment exact the DOUBLED average rank is used
    * (2·avgrank = 2o + c + 1, an integer — o strict-prefix rows, c tie
    * run), and Pearson over doubled ranks equals Pearson over ranks
    * (correlation is affine-invariant per key since both axes scale by
    * the same 2). Rank attachment is two joins back to rows on
    * (key, value) — never a per-row window, so the [[giniByKey]] skew
    * posture holds: a hot key costs its distinct-value count per
    * partition, not its row count on one task.
    *
    * Moments go through DECIMAL(38,0); the float formula
    * cov/√(vx·vy) runs per key-row in fixed order → bit-stable
    * micros. Keys with n < 2 or zero variance on either axis emit
    * NULL. Output: (key, n, rho_micro). */
  def spearmanByKey(df: DataFrame, keyCol: String, xCol: String,
                    yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    // rows feeds the stacked distinct tables AND the final rank join;
    // the ranked frame feeds both axes' filters — persist both so no
    // subtree replans (the mutualInformationCells discipline;
    // gate/bench harnesses release at query boundaries via
    // Blocks.releaseAll)
    val rows = df
      .select(col(keyCol).as("key"), col(xCol).cast("long").as("xv"),
        col(yCol).cast("long").as("yv"))
      .where(col("xv").isNotNull && col("yv").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // BOTH axes ride one prefixCounts pipeline under a composite
    // (key, axis) key — the percentile bounds, bucket subtotals and
    // offset windows run once over the stacked distinct tables
    // instead of once per axis (the round-6 20-exchange shape). The
    // global bucket boundaries mix both axes' values, which is fine:
    // prefixCounts only needs equal values to share a bucket and
    // bucket order to follow value order; the o counts stay per
    // (key, axis).
    val axes = rows.select(col("key"),
        explode(array(
          struct(lit(0).as("axis"), col("xv").as("v")),
          struct(lit(1).as("axis"), col("yv").as("v")))).as("e"))
      .select(col("key"), col("e.axis").as("axis"), col("e.v").as("v"))
    val grouped = axes
      .groupBy(struct(col("key").as("key"), col("axis").as("axis")).as("key"),
        col("v").as("x"))
      .agg(count(lit(1)).as("c"))
    val ranked = prefixCounts(grouped)
      .select(col("key.key").as("key"), col("key.axis").as("axis"),
        col("x"), (lit(2L) * col("o") + col("c") + lit(1L)).as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def ranks(axis: Int, vCol: String, out: String) =
      ranked.where(col("axis") === axis)
        .select(col("key"), col("x").as(vCol), col("r").as(out))
    val withR = rows
      .join(ranks(0, "xv", "rx"), Seq("key", "xv"))
      .join(ranks(1, "yv", "ry"), Seq("key", "yv"))
    val m = withR.groupBy("key").agg(
      count(lit(1)).as("n"),
      sum(col("rx").cast(dec)).as("sx"), sum(col("ry").cast(dec)).as("sy"),
      sum(col("rx").cast(dec) * col("ry").cast(dec)).as("sxy"),
      sum(col("rx").cast(dec) * col("rx").cast(dec)).as("sxx"),
      sum(col("ry").cast(dec) * col("ry").cast(dec)).as("syy"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val cov = d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))
    val vx = d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))
    val vy = d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n"))
    m.select(col("key"), col("n"),
      when(col("n") >= 2 && vx > 0 && vy > 0,
        round(cov / sqrt(vx * vy) * 1e6).cast("long")).as("rho_micro"))
  }

  /** Theil–Sen robust trend per key over daily counts: the LOWER
    * median of all pairwise slopes (d1 < d2) — one wild day cannot
    * drag the estimate the way it drags [[TimeSeries.trendPerKey]]'s
    * OLS slope. Slopes are exact-integer-fed floors:
    * ⌊Δv·10⁶ / Δdays⌋ over IEEE doubles (both engines round-to-nearest
    * the same quotient, Δv·10⁶ ≤ 2⁵³ exact), so every slope is the
    * identical long on both engines, and the lower-median selection
    * (ascending position ⌈n/2⌉) is pure integer arithmetic.
    *
    * Scale: days are calendar-bounded (a year of days → ~6.7e4 pairs
    * per key), so the per-key pair join and the one ranking window are
    * bounded by days², never by row count — the same bound
    * [[TimeSeries.lagCorrDaily]] documents. Output: (key, n_days,
    * n_pairs, slope_micro); keys with < 2 days drop (no pair). */
  def theilSenDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol).as("key"), unix_date(col(tsCol).cast("date")).as("d"))
      .where(col("d").isNotNull)
      .groupBy("key", "d").agg(count(lit(1)).as("v"))
    val pairs = daily.as("a")
      .join(daily.withColumnRenamed("d", "d2").withColumnRenamed("v", "v2")
        .as("b"), col("a.key") === col("b.key") && col("a.d") < col("d2"))
      .select(col("a.key").as("key"),
        floor((col("v2") - col("v")).cast("double") * 1e6
          / (col("d2") - col("a.d")).cast("double")).cast("long")
          .as("slope_micro"))
    val nDays = daily.groupBy("key").agg(count(lit(1)).as("n_days"))
    val w = Window.partitionBy("key").orderBy("slope_micro")
    val med = pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("__np", count(lit(1)).over(Window.partitionBy("key")))
      // lower median: ascending position ⌈np/2⌉ = (np + 1) div 2
      .where(col("__rn") === expr("(__np + 1L) div 2L"))
      .select(col("key"), col("__np").as("n_pairs"), col("slope_micro"))
    nDays.join(med, Seq("key"))
  }

  /** Isotonic regression over calibration bins (PAVA fit): the
    * monotone recalibration step after [[calibrationBins]] — pooled
    * positive rates that never decrease with score. Uses the minimax
    * closed form ŷ_i = max_{j≤i} min_{k≥i} avg(pos_j..k / n_j..k) over
    * the non-empty bins, which equals the pool-adjacent-violators fit
    * but is expressible as bounded joins: bins are metadata-scale
    * (≤ ~10³), so the bins³ interval enumeration is trivial while the
    * row-scale work stays one map-side-combined aggregate. Interval
    * averages are IEEE quotients of exact longs — identical doubles on
    * both engines — so the minimax and the final micro are bit-stable.
    * Output: (bin, lo_milli, hi_milli, n, pos, iso_micro) for
    * non-empty bins, iso_micro monotone non-decreasing. */
  def isotonicFit(df: DataFrame, scoreMilliCol: String, labelCol: String,
                  bins: Int, loMilli: Long, hiMilli: Long): DataFrame = {
    // ≤ bins rows feeding three consumers (prefix, interval spine,
    // final join) — persist so the row-scale binning aggregate runs
    // once (released at query boundaries via Blocks.releaseAll)
    val binned = calibrationBins(df, scoreMilliCol, labelCol, bins,
      loMilli, hiMilli)
      .where(col("n") > 0)
      .select("bin", "lo_milli", "hi_milli", "n", "pos")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bins-scale from here on: prefix sums over ≤ `bins` rows
    val wp = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = binned.select(col("bin"), col("n"), col("pos"),
      sum("n").over(wp).as("pn"), sum("pos").over(wp).as("pp"))
    val ivl = pref.select(col("bin").as("j"),
        (col("pn") - col("n")).as("pn0"), (col("pp") - col("pos")).as("pp0"))
      .join(pref.select(col("bin").as("k"), col("pn").as("pnk"),
        col("pp").as("ppk")), col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("ppk") - col("pp0")).cast("double")
          / (col("pnk") - col("pn0")).cast("double")).as("avg_jk"))
    val perI = binned.select(col("bin").as("i"))
      .join(ivl, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("i", "j").agg(min("avg_jk").as("mn"))
      .groupBy("i").agg(max("mn").as("iso"))
    binned.join(perI, col("bin") === col("i"))
      .select(col("bin"), col("lo_milli"), col("hi_milli"), col("n"),
        col("pos"), round(col("iso") * 1e6).cast("long").as("iso_micro"))
  }

  /** Mann–Kendall trend statistic per key over daily counts — the
    * hypothesis-test companion of [[theilSenDaily]] (the two are the
    * standard robust-trend pair): S = Σ_{i<j} sign(v_j − v_i) over
    * day pairs, plus tau-a = S / n_pairs. S and the pair counts are
    * pure integer aggregates over the same calendar-bounded pair join
    * as theilSen; tau goes through one fixed-order float (round, not
    * integer div — S can be negative and truncate/floor semantics
    * diverge across engines below zero). Output: (key, n_days,
    * n_pairs, s_stat, tau_micro). Keys with < 2 days drop. */
  def mannKendallDaily(df: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol).as("key"), unix_date(col(tsCol).cast("date")).as("d"))
      .where(col("d").isNotNull)
      .groupBy("key", "d").agg(count(lit(1)).as("v"))
    val nDays = daily.groupBy("key").agg(count(lit(1)).as("n_days"))
    val pairs = daily.as("a")
      .join(daily.withColumnRenamed("d", "d2").withColumnRenamed("v", "v2")
        .as("b"), col("a.key") === col("b.key") && col("a.d") < col("d2"))
      .select(col("a.key").as("key"), signum(col("v2") - col("v"))
        .cast("long").as("sgn"))
    val agg = pairs.groupBy("key").agg(count(lit(1)).as("n_pairs"),
      sum("sgn").as("s_stat"))
    nDays.join(agg, Seq("key"))
      .select(col("key"), col("n_days"), col("n_pairs"), col("s_stat"),
        round(col("s_stat").cast("double") / col("n_pairs").cast("double")
          * 1e6).cast("long").as("tau_micro"))
  }

  /** Poisson bootstrap of the per-key mean — THE scale-out bootstrap:
    * classical resampling needs n draws per replicate from one urn
    * (undistributable); the Poisson approximation gives every row an
    * independent Poisson(1) weight per replicate, so the whole B-fold
    * resample is one explode + one aggregate, embarrassingly
    * parallel. Weights come from a seeded md5₆₀ draw against the
    * EXACT integer thresholds ⌊CDF_Poisson(1)(k)·2⁶⁰⌋ (k ≤ 4, tail
    * capped at 5) — no float enters the draw, so every engine deals
    * identical weights. Per (key, replicate): n_eff = Σw and the
    * weighted mean in fixed float order → bit-stable micros (input is
    * milli-scaled; NULL when a replicate draws no weight). Replicate
    * spread IS the sampling distribution of the mean. Output: (key,
    * b, n_eff, mean_micro). */
  def bootstrapMeans(df: DataFrame, keyCol: String, idCol: String,
                     valueMilliCol: String, reps: Int,
                     seed: Long): DataFrame = {
    require(reps >= 1, s"need reps >= 1, got $reps")
    val dec = DecimalType(38, 0)
    val h = graft.functions.Hashes.md5Hash64(
      concat(lit(s"$seed:"), col("b").cast("string"), lit(":"),
        col("__id").cast("string")))
    val w = poissonThresholds.zipWithIndex.foldRight(
      lit(5L): org.apache.spark.sql.Column) { case ((t, k), rest) =>
        when(h < t, k.toLong).otherwise(rest) }
    df.select(col(keyCol).as("key"), col(idCol).cast("string").as("__id"),
        col(valueMilliCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("w", w)
      .groupBy("key", "b").agg(sum("w").as("n_eff"),
        sum(col("w").cast(dec) * col("v").cast(dec)).as("ws"))
      .select(col("key"), col("b").cast("long").as("b"), col("n_eff"),
        when(col("n_eff") > 0,
          round(col("ws").cast("double") / col("n_eff").cast("double")
            * 1000).cast("long")).as("mean_micro"))
  }

  /** Hodges–Lehmann location estimator per key over daily counts —
    * the robust "typical daily volume" (median of all pairwise Walsh
    * averages (v_i + v_j)/2, i ≤ j): ~30% more efficient than the
    * plain median under normality, still 29%-breakdown robust; the
    * natural location companion of [[theilSenDaily]]'s slope. Walsh
    * sums are kept DOUBLED (v_i + v_j, exact longs) so no half ever
    * floats; the lower-median pick is integer rank arithmetic and the
    * final estimate is w/2 in micros (w·500000 — exact). Pairs are
    * calendar-bounded ([[theilSenDaily]]'s bound). Output: (key,
    * n_days, n_walsh, hl_micro). */
  def hodgesLehmannDaily(df: DataFrame, keyCol: String,
                         tsCol: String): DataFrame = {
    val daily = df
      .select(col(keyCol).as("key"), unix_date(col(tsCol).cast("date")).as("d"))
      .where(col("d").isNotNull)
      .groupBy("key", "d").agg(count(lit(1)).as("v"))
    val nDays = daily.groupBy("key").agg(count(lit(1)).as("n_days"))
    val walsh = daily.as("a")
      .join(daily.withColumnRenamed("d", "d2").withColumnRenamed("v", "v2")
        .as("b"), col("a.key") === col("b.key") && col("a.d") <= col("d2"))
      .select(col("a.key").as("key"), (col("v") + col("v2")).as("w2"))
    val w = Window.partitionBy("key").orderBy("w2")
    val med = walsh
      .withColumn("__rn", row_number().over(w))
      .withColumn("__np", count(lit(1)).over(Window.partitionBy("key")))
      .where(col("__rn") === expr("(__np + 1L) div 2L"))
      .select(col("key"), col("__np").as("n_walsh"),
        (col("w2") * 500000L).as("hl_micro"))
    nDays.join(med, Seq("key"))
  }

  /** Herfindahl–Hirschman concentration per key — the market-share
    * view beside [[giniByKey]]'s inequality view (mixture audits:
    * how concentrated is a source's token mass across documents?):
    * HHI = Σ sᵢ² over shares sᵢ = xᵢ/Σx ∈ (0, 1]. Exact integer
    * moments (Σx as long, Σx² through DECIMAL(38,0) — partial-agg
    * order immune), one fixed-order float → micros. 1/n ≤ HHI ≤ 1;
    * keys with Σx ≤ 0 drop. One map-side-combined aggregate, nothing
    * else. Output: (key, n, total, hhi_micro). */
  def hhiByKey(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = col(valueCol).cast("long")
    val agg = df.where(x.isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"), sum(x).as("total"),
        sum(x.cast(dec) * x.cast(dec)).as("ss"))
    def d(c: String) = col(c).cast("double")
    agg.where(col("total") > 0)
      .select(col("key"), col("n"), col("total"),
        round(d("ss") / (d("total") * d("total")) * 1e6).cast("long")
          .as("hhi_micro"))
  }

  /** Exact type-1 (inverse-ECDF) percentiles per key for a set of
    * micro-scaled probabilities — "p50/p90/p99 of X per key" with NO
    * approximation: the rank-⌈p·n⌉ order statistic is the smallest
    * value whose cumulative DISTINCT-value count reaches the rank
    * (the [[winsorizePerKey]] discipline), so a hot key costs its
    * distinct-value count, never its row count, and no float enters
    * the rank math (ranks from p_micro·n with ceil in pure integer
    * arithmetic). Output: (key, p_micro, value) — one row per
    * requested percentile per key. */
  def quantilesPerKey(df: DataFrame, keyCol: String, valueCol: String,
                      psMicro: Seq[Long]): DataFrame = {
    require(psMicro.nonEmpty && psMicro.forall(p => p >= 0 && p <= 1000000L),
      s"p_micro values must be in [0, 1e6], got $psMicro")
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df
      .select(col(keyCol).as("key"), col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull)
      .groupBy("key", "x").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("key").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("key")
    val cum = grouped
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
    val ps = psMicro.toDF("p_micro")
    // rank = ceil(p·n / 1e6) clamped to ≥ 1, pure integers
    cum.join(broadcast(ps))
      .withColumn("rank",
        greatest(expr("(p_micro * n + 999999L) div 1000000L"), lit(1L)))
      .where(col("cum") - col("c") < col("rank") && col("rank") <= col("cum"))
      .select(col("key"), col("p_micro"), col("x").as("value"))
  }

  /** Median/MAD robust outlier audit per key — the data-quality
    * screen that survives the outliers it hunts (mean/std absorbs a
    * heavy tail into its own threshold; the 50%-breakdown median/MAD
    * pair does not). Per key: the type-1 median m, the median
    * absolute deviation MAD = median(|x − m|), and the count of rows
    * with |x − m| > k·MAD — all in pure integers (both medians via
    * [[quantilesPerKey]]'s distinct-count rank selection; the
    * threshold compare is exact longs, no 1.4826 consistency float
    * anywhere). MAD = 0 (a majority-constant key) flags every
    * deviating row — deterministic and the honest reading. Cost: two
    * distinct-count median passes + one row-side join per pass; a hot
    * key pays its distinct values, never its rows, on any single
    * task. Output: (key, n, median, mad, n_outliers). */
  def madOutliersPerKey(df: DataFrame, keyCol: String, valueCol: String,
                        k: Long = 3L): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val rows = df
      .select(col(keyCol).as("key"), col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = quantilesPerKey(rows, "key", "x", Seq(500000L))
      .select(col("key"), col("value").as("median"))
    val dev = rows.join(med, Seq("key"))
      .select(col("key"), col("median"), abs(col("x") - col("median"))
        .as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = quantilesPerKey(dev, "key", "d", Seq(500000L))
      .select(col("key"), col("value").as("mad"))
    dev.join(mad, Seq("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), first("median").as("median"),
        first("mad").as("mad"),
        sum(when(col("d") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Kaplan–Meier survival curve per key over right-censored
    * durations — "how long until churn/conversion, given that many
    * subjects haven't converted YET?" (dropping censored rows biases
    * short; KM is the standard correction). Input rows: (key,
    * duration t ≥ 0 integer, event ∈ {true = observed, false =
    * censored}). At each distinct observed-event time, with n_i at
    * risk (t ≥ tᵢ) and dᵢ events, the survivor multiplies by
    * (nᵢ − dᵢ)/nᵢ.
    *
    * The cumulative PRODUCT is the replay hazard (product aggregates
    * differ across engines; exp∘Σlog reorders floats) — so each
    * step's log factor is micro-quantized FIRST
    * (round(ln((n−d)/n)·10⁶), the same IEEE double everywhere), the
    * cumulative is an exact INTEGER window sum over distinct event
    * times, and S = round(exp(cum/10⁶)·10⁶) is one fixed float per
    * row. At-risk counts come from a descending cumulative over
    * distinct (key, t) cells — a hot key costs its distinct times
    * (the [[giniByKey]] cost model), never its rows. Output: (key,
    * t, n_risk, d, s_micro), one row per distinct observed-event
    * time, ordered by t per key downstream. */
  def kaplanMeier(df: DataFrame, keyCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val rows = df.select(col(keyCol).as("key"),
        col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").cast("long").as("e"))
      .where(col("t").isNotNull && col("t") >= 0 && col("e").isNotNull)
    val cells = rows.groupBy("key", "t")
      .agg(count(lit(1)).as("c"), sum("e").as("d"))
    val wGe = Window.partitionBy("key").orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = cells.withColumn("n_risk", sum("c").over(wGe))
      .where(col("d") > 0)
    val lf = round(log((col("n_risk") - col("d")).cast("double")
      / col("n_risk").cast("double")) * 1e6).cast("long")
    val wCum = Window.partitionBy("key").orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk
      // d = n_risk (everyone at risk dies at the last step) → S = 0:
      // ln 0 is -inf; pin the log-micro to a sentinel the exp rounds
      // to exactly 0 on both engines
      .withColumn("__lf", when(col("d") < col("n_risk"), lf)
        .otherwise(lit(-100000000L)))
      .withColumn("__cum", sum("__lf").over(wCum))
      .select(col("key"), col("t"), col("n_risk"), col("d"),
        round(exp(col("__cum").cast("double") / 1e6) * 1e6).cast("long")
          .as("s_micro"))
  }

  /** Wilcoxon signed-rank test per stratum over paired integer
    * differences — the PAIRED companion of [[mannWhitneyU]] (same
    * subject measured twice: before/after, A-vs-B within user). Zero
    * differences drop (the standard convention); |diff| ranks use
    * DOUBLED average ranks (2o + c + 1 — exact under ties, the
    * [[spearmanByKey]] device) over DISTINCT (stratum, |diff|) counts
    * via the shared [[prefixCounts]] two-phase machinery, so a hot
    * stratum costs its distinct magnitudes. The doubled statistic
    * W₂ = Σ_{diff>0} r₂ has E[W₂] = n(n+1)/2 and
    * 12·Var[W₂] = 2n(n+1)(2n+1) − Σ(t³−t) (tie runs t) — every
    * moment an exact integer; one fixed-order float z at the end.
    * Output: (key, n, w2, z_micro — NULL when n < 1 or the
    * tie-corrected variance is 0). */
  def wilcoxonSignedRank(df: DataFrame, stratumCol: String,
                         diffCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df
      .select(col(stratumCol).as("key"), col(diffCol).cast("long").as("dv"))
      .where(col("dv").isNotNull && col("dv") =!= 0L)
    // grouped feeds prefixCounts' percentile bounds AND the bucketed
    // prefix — persist (the spearmanByKey discipline; Blocks.releaseAll
    // frees at query boundaries)
    val grouped = rows
      .groupBy(col("key"), abs(col("dv")).as("x"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("dv") > 0, 1L).otherwise(0L)).as("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = prefixCounts(grouped)
      .withColumn("r2", lit(2L) * col("o") + col("c") + lit(1L))
    val agg = ranked.groupBy("key").agg(
      sum("c").as("n"),
      sum(col("pos").cast(dec) * col("r2").cast(dec)).cast("long").as("w2"),
      sum(col("c").cast(dec) * col("c").cast(dec) * col("c").cast(dec)
        - col("c").cast(dec)).as("ties"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val mean = d(col("n")) * (d(col("n")) + lit(1.0)) / lit(2.0)
    val var12 = lit(2.0) * d(col("n")) * (d(col("n")) + lit(1.0)) *
      (lit(2.0) * d(col("n")) + lit(1.0)) - d(col("ties"))
    agg.select(col("key"), col("n"), col("w2"),
      when(col("n") >= 1 && var12 > 0,
        round((d(col("w2")) - mean) / sqrt(var12 / 12.0) * 1e6)
          .cast("long")).as("z_micro"))
  }

  /** McNemar's test per stratum over paired booleans — "did the
    * treatment flip outcomes?" on the same subjects (a = before,
    * b = after): only the DISCORDANT pairs carry information, and the
    * statistic (b01 − c10)² / (b01 + c10) compares the two flip
    * directions. One map-side-combined aggregate; the stat is
    * integer-exact micros by non-negative division ((b−c)² ≥ 0).
    * NULL on either side drops the pair. Output: (key, n_pairs, b01
    * — a true, b false — c10 — a false, b true — stat_micro, NULL
    * when no discordant pairs). */
  def mcnemar(df: DataFrame, stratumCol: String, aCol: String,
              bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    df.where(a.isNotNull && b.isNotNull)
      .groupBy(col(stratumCol).as("key"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(a && !b, 1L).otherwise(0L)).as("b01"),
        sum(when(!a && b, 1L).otherwise(0L)).as("c10"))
      .withColumn("stat_micro",
        when(col("b01") + col("c10") > 0,
          expr("((b01 - c10) * (b01 - c10) * 1000000L) div (b01 + c10)")))
  }

  /** Cramér's V for a two-way contingency table — the EFFECT-SIZE
    * companion of the chi-square screen (χ² says "dependent",
    * V ∈ [0, 1] says "how strongly", comparable across table sizes):
    * V = √(χ² / (n · min(r−1, c−1))). χ² accumulates per cell as
    * (o·n − rt·ct)² / (n·rt·ct) over exact integer margins — every
    * product through DECIMAL, one fixed-order float per cell,
    * micro-summed exactly (order-free), then one final float. Output:
    * one row (n, r, c, chi2_micro, v_micro); degenerate tables
    * (r < 2 or c < 2) emit NULL v. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.where(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
    val cells = base.groupBy("a", "b").agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ra = cells.groupBy("a").agg(sum("o").as("rt"))
    val cb = cells.groupBy("b").agg(sum("o").as("ct"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    // per-cell χ² term over exact integers, micro-quantized before the
    // exact integer fold (the q199 discipline)
    val num = d(col("o").cast(dec) * col("n").cast(dec)
      - col("rt").cast(dec) * col("ct").cast(dec))
    val den = d(col("n").cast(dec) * col("rt").cast(dec)
      * col("ct").cast(dec))
    val termMicro = round(num * num / den * 1e6).cast("long")
    val n = cells.agg(sum("o").as("n"), count_distinct(col("a")).as("r"),
      count_distinct(col("b")).as("c"))
    // FULL r×c spine (margins crossed, categorical-scale): a zero cell
    // still contributes (rt·ct)²/(n·rt·ct) — dropping it understates
    // χ² exactly where the association is strongest
    val agg = broadcast(ra).crossJoin(broadcast(cb))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .agg(first("n").as("n"), first("r").as("r"), first("c").as("c"),
        sum(termMicro).as("chi2_micro"))
    agg.select(col("n"), col("r"), col("c"), col("chi2_micro"),
      when(col("r") >= 2 && col("c") >= 2,
        round(sqrt(d(col("chi2_micro")) / lit(1e6)
          / (d(col("n")) * least(col("r") - 1, col("c") - 1)
            .cast("double"))) * 1e6).cast("long")).as("v_micro"))
  }

  /** Cohen's d per stratum — the effect size beside [[welchZ]]'s
    * significance (a tiny shift on a huge n is "significant" but may
    * be negligible; d normalizes by the pooled spread): d = (m_A −
    * m_B) / s_pooled with the (n_A−1)/(n_B−1)-weighted pooled sample
    * variance. Same exact-moment aggregate as welchZ (Σx, Σx²
    * through DECIMAL), one fixed-order float. Strata missing a group
    * drop; n_A + n_B < 3 or zero pooled variance → NULL d. Output:
    * (stratum, n_a, n_b, d_micro). */
  def cohensD(df: DataFrame, stratumCol: String, groupCol: String,
              groupA: String, groupB: String, milliCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val m = df
      .where(col(groupCol).isin(groupA, groupB))
      .groupBy(col(stratumCol).as("stratum"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col(milliCol).cast("long")).as("s"),
        sum(col(milliCol).cast(dec) * col(milliCol).cast(dec)).as("ss"))
    def pick(c: String, g: String) =
      first(when(col("g") === g, col(c)), ignoreNulls = true)
    val piv = m.groupBy("stratum").agg(
      pick("n", groupA).as("n_a"), pick("s", groupA).as("s_a"),
      pick("ss", groupA).as("ss_a"),
      pick("n", groupB).as("n_b"), pick("s", groupB).as("s_b"),
      pick("ss", groupB).as("ss_b"))
    def d(c: String) = col(c).cast("double")
    def css(ss: String, s: String, n: String) =
      d(ss) - d(s) * d(s) / d(n)
    val pooled = (css("ss_a", "s_a", "n_a") + css("ss_b", "s_b", "n_b")) /
      (d("n_a") + d("n_b") - lit(2.0))
    val diff = d("s_a") / d("n_a") - d("s_b") / d("n_b")
    piv.where(col("n_a").isNotNull && col("n_b").isNotNull)
      .select(col("stratum"), col("n_a"), col("n_b"),
        when(col("n_a") + col("n_b") >= 3 && pooled > 0,
          round(diff / sqrt(pooled) * 1e6).cast("long")).as("d_micro"))
  }

  /** Two-proportion z-test per stratum — conversion-rate A/B on
    * binary outcomes: z = (p_A − p_B) / √(p̂(1−p̂)(1/n_A + 1/n_B))
    * with the pooled p̂. One aggregate of exact counts, one
    * fixed-order float. Degenerate strata (missing group, n = 0, or
    * pooled p̂ ∈ {0, 1}) → NULL z. Output: (stratum, n_a, pos_a,
    * n_b, pos_b, z_micro). */
  def proportionsZ(df: DataFrame, stratumCol: String, groupCol: String,
                   groupA: String, groupB: String,
                   labelCol: String): DataFrame = {
    val m = df
      .where(col(groupCol).isin(groupA, groupB) &&
        col(labelCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("boolean").cast("long")).as("pos"))
    def pick(c: String, g: String) =
      first(when(col("g") === g, col(c)), ignoreNulls = true)
    val piv = m.groupBy("stratum").agg(
      pick("n", groupA).as("n_a"), pick("pos", groupA).as("pos_a"),
      pick("n", groupB).as("n_b"), pick("pos", groupB).as("pos_b"))
    def d(c: String) = col(c).cast("double")
    val pHat = (d("pos_a") + d("pos_b")) / (d("n_a") + d("n_b"))
    val se = sqrt(pHat * (lit(1.0) - pHat)
      * (lit(1.0) / d("n_a") + lit(1.0) / d("n_b")))
    val z = (d("pos_a") / d("n_a") - d("pos_b") / d("n_b")) / se
    piv.where(col("n_a").isNotNull && col("n_b").isNotNull)
      .select(col("stratum"), col("n_a"), col("pos_a"), col("n_b"),
        col("pos_b"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("pos_a") + col("pos_b") > 0 &&
          col("pos_a") + col("pos_b") < col("n_a") + col("n_b"),
          round(z * 1e6).cast("long")).as("z_micro"))
  }

  /** ⌊CDF_Poisson(1)(k)·2⁶⁰⌋ for k = 0..4 — the integer draw
    * thresholds [[bootstrapMeans]] and its oracle share verbatim. */
  private[graft] val poissonThresholds: Seq[Long] = {
    val e = math.exp(-1.0)
    val pmf = Seq(1.0, 1.0, 0.5, 1.0 / 6, 1.0 / 24).map(_ * e)
    pmf.scanLeft(0.0)(_ + _).tail
      .map(c => (c * 1152921504606846976.0).toLong) // × 2⁶⁰
  }

  /** Per-key counts with deterministic bounded integer noise — the
    * shape of a differentially-private release pipeline (count, plus
    * noise, plus a non-negativity clamp), with the noise drawn from a
    * seeded hash instead of a Laplace sampler so the release is
    * replayable in tests and across engines. NOT a privacy guarantee:
    * a production deployment swaps `noise` for a real Laplace/discrete-
    * Gaussian draw at scale ε — the plumbing (per-key draw, clamp,
    * released-vs-true audit columns) is what this operator pins.
    * noise = (md5₆₀(seed:key) mod (2·bound+1)) − bound, uniform on
    * [−bound, bound]. Output: (key, n, noise, n_noisy ≥ 0). */
  def dpNoisyCounts(df: DataFrame, keyCol: String, bound: Int,
                    seed: Long): DataFrame = {
    require(bound >= 0, s"noise bound must be >= 0, got $bound")
    val h = graft.functions.Hashes.md5Hash64(
      concat(lit(s"$seed:"), col("key").cast("string")))
    df.select(col(keyCol).as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .withColumn("noise", pmod(h, lit(2L * bound + 1)) - lit(bound.toLong))
      .withColumn("n_noisy", greatest(col("n") + col("noise"), lit(0L)))
  }

  /** Per-key winsorization of an integer measure: clamp every row's
    * value into the key's [pLo, pHi] exact percentile band — the
    * outlier-capping step feature pipelines run before scaling
    * (heavy-tailed doc lengths, spend, token counts).
    *
    * Percentile convention is type-1 (inverse ECDF): the value at
    * ascending rank ⌈p·n⌉ (clamped to ≥ 1), identical on both engines
    * in pure integer arithmetic — rank bounds come from micro-scaled
    * p so no float ever enters. Thresholds are computed from DISTINCT
    * (key, value) counts with a per-key cumulative sum over distinct
    * values only (the [[giniByKey]] discipline): the rank-r order
    * statistic is the smallest value whose cumulative count reaches
    * r, so per-row ranks are never materialized and a hot key costs
    * its distinct-value count, not its row count. Rows then get the
    * broadcast-joined thresholds and a two-sided clamp — a zero-window
    * row-side pass.
    *
    * Output: one row per input row — (key, id, x, x_lo, x_hi,
    * x_wins). NULL values pass through unclamped (no rank). */
  def winsorizePerKey(df: DataFrame, keyCol: String, valueCol: String,
                      idCol: String, pLoMicro: Long, pHiMicro: Long): DataFrame = {
    require(pLoMicro >= 0 && pHiMicro <= 1000000L && pLoMicro < pHiMicro,
      s"need 0 <= pLo < pHi <= 1e6 in micros, got ($pLoMicro, $pHiMicro)")
    val rows = df.select(col(keyCol).as("key"), col(idCol).as("id"),
      col(valueCol).cast("long").as("x"))
    val grouped = rows.where(col("x").isNotNull)
      .groupBy("key", "x").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("key").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy("key")
    val cum = grouped
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wKey))
      .withColumn("lo_rank",
        greatest(lit(1L), expr(s"(n * ${pLoMicro}L + 999999L) div 1000000L")))
      .withColumn("hi_rank",
        greatest(lit(1L), expr(s"(n * ${pHiMicro}L + 999999L) div 1000000L")))
    val thresholds = cum.groupBy("key").agg(
      min(when(col("cum") >= col("lo_rank"), col("x"))).as("x_lo"),
      min(when(col("cum") >= col("hi_rank"), col("x"))).as("x_hi"))
    rows.join(broadcast(thresholds), Seq("key"))
      .select(col("key"), col("id"), col("x"), col("x_lo"), col("x_hi"),
        when(col("x").isNull, lit(null).cast("long"))
          .otherwise(least(greatest(col("x"), col("x_lo")), col("x_hi")))
          .as("x_wins"))
  }

  /** Per-digit Benford deviation over a positive integer measure —
    * the financial-forensics screen (fabricated figures drift from
    * the log distribution real ledgers follow). First significant
    * digit is taken from the INTEGER's decimal rendering
    * (substring(cast(v as string),1,1)) — engine-portable, unlike
    * log10-of-double edge cases. One (key, digit) count shuffle, a
    * key-scale total, and the 1..9 grid completed by broadcast cross
    * join so absent digits surface as explicit zero rows. Expected
    * proportions are driver-side constants (round(1e6·log10(1+1/d)))
    * embedded identically in the SQL oracle — no cross-engine float
    * path at all; dev_micro is an integer subtraction.
    * Output: (key, digit, n_d, n, obs_micro, exp_micro, dev_micro). */
  def benfordDeviation(df: DataFrame, keyCol: String,
                       valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol).cast("long")
    val counts = df.where(v > 0)
      .select(col(keyCol).as("key"),
        substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("key", "digit").agg(count(lit(1)).as("n_d"))
    val totals = counts.groupBy("key").agg(sum("n_d").as("n"))
    val expected = benfordExpectedMicro.toSeq.sorted.toDF("digit", "exp_micro")
    totals
      .crossJoin(broadcast(expected))
      .join(counts, Seq("key", "digit"), "left")
      .select(col("key"), col("digit"),
        coalesce(col("n_d"), lit(0L)).as("n_d"), col("n"),
        round(lit(1e6) * coalesce(col("n_d"), lit(0L)).cast("double")
          / col("n").cast("double")).cast("long").as("obs_micro"),
        col("exp_micro"))
      .withColumn("dev_micro", col("obs_micro") - col("exp_micro"))
  }

  /** round(1e6 · log10(1 + 1/d)) for d = 1..9 — computed once on the
    * driver and shared verbatim with the oracle SQL. */
  val benfordExpectedMicro: Map[Int, Long] =
    (1 to 9).map(d => d -> math.round(1e6 * math.log10(1.0 + 1.0 / d))).toMap

  /** Two-sample Kolmogorov–Smirnov D per stratum — the drift screen
    * between corpus snapshots or A/B populations: D = max_x
    * |F_A(x) − F_B(x)| over the pooled support. Runs EXACTLY in
    * integers until one final division: per-(stratum, value) side
    * counts (one shuffle), cumulative counts via a stratum window
    * (reuses the same partitioning), and the max of
    * |cumA·n_B − cumB·n_A| through DECIMAL(38,0) — an exact integer
    * max, no float comparison ever decides the argmax. d_micro =
    * round(1e6 · maxdiff / (n_A·n_B)). Strata missing either side are
    * dropped. `valueCol` must be integer-valued (cents, milli-units).
    * Output: (stratum, n_a, n_b, d_micro). */
  def ksByStratum(df: DataFrame, stratumCol: String, groupCol: String,
                  groupA: String, groupB: String,
                  valueCol: String): DataFrame = {
    val v = col(valueCol).cast("long")
    ksFromCounts(df.where(col(groupCol).isin(groupA, groupB))
      .groupBy(col(stratumCol).as("stratum"), v.as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb")))
  }

  /** [[ksByStratum]] over PRE-AGGREGATED per-(stratum, v) side counts
    * (ca, cb) — the form incremental pipelines hold (a persisted count
    * store vs a reference histogram: [[graft.streaming.StreamMonitor]]).
    * Input needs (stratum, v, ca, cb); absent values on one side must
    * appear with that side's count 0 (a full-outer count join). */
  def ksFromCounts(c: DataFrame): DataFrame = {
    val w = Window.partitionBy("stratum").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c.select(col("stratum"),
      sum("ca").over(w).as("cuma"), sum("cb").over(w).as("cumb"))
    val tot = c.groupBy("stratum")
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    cum.join(tot, Seq("stratum"))
      .groupBy(col("stratum"), col("n_a"), col("n_b"))
      .agg(max(abs(col("cuma").cast(DecimalType(38, 0)) * col("n_b")
        - col("cumb").cast(DecimalType(38, 0)) * col("n_a"))).as("maxdiff"))
      .where(col("n_a") > 0 && col("n_b") > 0)
      .select(col("stratum"), col("n_a"), col("n_b"),
        round(lit(1e6) * col("maxdiff").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .cast("long").as("d_micro"))
  }

  /** 2-D skyline (Pareto frontier), minimizing both `xCol` and
    * `yCol` within each `keyCols` group: rows no other row dominates
    * (other ≤ in both, < in at least one). Window-only — NO self-join:
    * sorted by x, a row is dominated iff min(y) over strictly-smaller
    * x is ≤ its y, or some same-x row has strictly smaller y. Both
    * windows share one (keys, x) sort; per-group frames, corpus never
    * fans out. The classic sort-scan skyline (Börzsönyi's SFS) as two
    * Catalyst windows.
    *
    * `xCol` must be integer-valued (the strict-predecessor frame is
    * RANGE −1); scale doubles to cents/micros upstream. Exact
    * duplicate (x, y) pairs dominate nothing and are all kept. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                keyCols: Seq[String] = Nil): DataFrame = {
    val wPrev = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(xCol)).rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy((keyCols :+ xCol).map(col): _*)
    df
      .withColumn("__min_prev", min(col(yCol)).over(wPrev))
      .withColumn("__min_same", min(col(yCol)).over(wSame))
      .where((col("__min_prev").isNull || col("__min_prev") > col(yCol)) &&
        col("__min_same") === col(yCol))
      .drop("__min_prev", "__min_same")
  }

  /** Mann–Whitney U per stratum — the nonparametric sibling of
    * [[welchZ]] for skewed measures (lengths, latencies) where a mean
    * comparison misleads. All rank arithmetic runs over DISTINCT
    * (stratum, value) counts, never per-row ranks: a tie run of
    * c = c_a + c_b rows with o smaller rows before it has average
    * rank o + (c+1)/2, so A's rank-sum in HALF-units (to stay in
    * integers) is Σ_x c_a(x)·(2o(x) + c(x) + 1). The per-stratum
    * cumulative o comes from a window over distinct values only
    * (the [[winsorizePerKey]] discipline — a hot stratum costs its
    * distinct-value count). The normal-approximation z uses the
    * exact tie-corrected variance
    *   σ² = (n_a·n_b/12)·(n + 1 − Σ(t³−t)/(n(n−1)))
    * computed from exact integer moments (tie cross-products through
    * DECIMAL(38,0)), then ONE fixed-order float expression; the ½
    * continuity correction is applied toward the null. Strata where
    * either group is empty or σ = 0 emit NULL z.
    *
    * Output: (stratum, n_a, n_b, r2_a — 2·rank-sum of A,
    * u2_a — 2·U_A, z_micro). */
  def mannWhitneyU(df: DataFrame, stratumCol: String, groupCol: String,
                   groupA: String, groupB: String,
                   valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df
      .where(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .select(col(stratumCol).as("stratum"),
        when(col(groupCol) === groupA, lit("a")).otherwise(lit("b")).as("g"),
        col(valueCol).cast("long").as("x"))
    val grouped = rows.groupBy("stratum", "x").agg(
      sum(when(col("g") === "a", 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === "b", 1L).otherwise(0L)).as("cb"))
    val wCum = Window.partitionBy("stratum").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grouped
      .withColumn("c", col("ca") + col("cb"))
      .withColumn("o", coalesce(sum(col("c")).over(wCum), lit(0L)))
    val agg = cum.groupBy("stratum").agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      sum(col("ca").cast(dec) * (lit(2L) * col("o") + col("c") + lit(1L))
        .cast(dec)).cast("long").as("r2_a"),
      // Σ(t³ − t) over tie runs (c = 1 contributes 0) — exact
      sum((col("c").cast(dec) * col("c").cast(dec) * col("c").cast(dec)
        - col("c").cast(dec))).cast(dec).as("ties"))
    // fixed float order over the exact integers
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val withU = agg
      .withColumn("u2_a",
        col("r2_a") - col("n_a") * (col("n_a") + lit(1L)))
      .withColumn("n", col("n_a") + col("n_b"))
    val mean2 = d(col("n_a")) * d(col("n_b")) // E[2U] = n_a·n_b
    val sigma2sq = (d(col("n_a")) * d(col("n_b")) / lit(3.0)) *
      ((d(col("n")) + lit(1.0)) -
        d(col("ties")) / (d(col("n")) * (d(col("n")) - lit(1.0))))
    val diff = d(col("u2_a")) - mean2
    val corrected = when(diff > 0, diff - lit(1.0))
      .when(diff < 0, diff + lit(1.0)).otherwise(lit(0.0))
    val z = corrected / sqrt(sigma2sq)
    withU.select(col("stratum"), col("n_a"), col("n_b"),
      col("r2_a"), col("u2_a"),
      when(col("n_a") >= 1 && col("n_b") >= 1 && col("n") >= 2 &&
        sigma2sq > 0, round(z * 1e6).cast("long")).as("z_micro"))
  }

  /** Two-feature OLS per key — the next step past
    * [[TimeSeries.trendPerKey]]'s single regressor: fit
    * y = b0 + b1·x1 + b2·x2 per key by the closed-form 3×3 normal
    * equations (Cramer expansion), every moment an exact integer
    * aggregate (cross-products through DECIMAL(38,0), immune to
    * partial-agg order) and the solve ONE fixed-order float
    * expression per key-row → bit-stable micros. Keys with n < 3 or
    * a singular system (|det| below 1e-9 of scale) emit NULL
    * coefficients rather than garbage. Inputs must be integer-valued
    * (milli-scale upstream). Output: (key, n, b0_micro, b1_micro,
    * b2_micro). */
  def ols2PerKey(df: DataFrame, keyCol: String, x1Col: String,
                 x2Col: String, yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x1 = col(x1Col).cast("long"); val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    def cp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sum(a.cast(dec) * b.cast(dec))
    val m = df
      .where(x1.isNotNull && x2.isNotNull && y.isNotNull)
      .groupBy(col(keyCol).as("key")).agg(
        count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
        cp(x1, x1).as("s11"), cp(x1, x2).as("s12"), cp(x2, x2).as("s22"),
        cp(x1, y).as("s1y"), cp(x2, y).as("s2y"))
    def d(c: String) = col(c).cast("double")
    // normal matrix A = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]],
    // rhs = [sy, s1y, s2y]; Cramer with a FIXED cofactor order
    val (an, a12, a13) = (d("n"), d("s1"), d("s2"))
    val (a22, a23, a33) = (d("s11"), d("s12"), d("s22"))
    val (r1, r2, r3) = (d("sy"), d("s1y"), d("s2y"))
    def det3(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             c: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column,
             q: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column,
             x: org.apache.spark.sql.Column, yy: org.apache.spark.sql.Column,
             z: org.apache.spark.sql.Column) =
      a * (q * z - r * yy) - b * (p * z - r * x) + c * (p * yy - q * x)
    val det = det3(an, a12, a13, a12, a22, a23, a13, a23, a33)
    val det0 = det3(r1, a12, a13, r2, a22, a23, r3, a23, a33)
    val det1 = det3(an, r1, a13, a12, r2, a23, a13, r3, a33)
    val det2 = det3(an, a12, r1, a12, a22, r2, a13, a23, r3)
    // scale-aware singularity guard: |det| relative to the matrix's
    // own magnitude (n·s11·s22 term) — pure fixed-order float compare
    val scaleRef = abs(an * a22 * a33) + lit(1.0)
    val ok = col("n") >= 3 && abs(det) > scaleRef * lit(1e-9)
    m.select(col("key"), col("n"),
      when(ok, round(det0 / det * 1e6).cast("long")).as("b0_micro"),
      when(ok, round(det1 / det * 1e6).cast("long")).as("b1_micro"),
      when(ok, round(det2 / det * 1e6).cast("long")).as("b2_micro"))
  }

  /** One-way ANOVA F per stratum over k groups — [[welchZ]]'s
    * many-group sibling (equal-variance omnibus): F = (SSB/(k−1)) /
    * (SSW/(n−k)) from per-(stratum, group) exact moments (n, Σy,
    * Σy² via DECIMAL). The group moments aggregate once more per
    * stratum (metadata-scale), then ONE fixed-order float formula:
    *   SSB = Σ_g s_g²/n_g − S²/n,  SSW = Σ_g ss_g − Σ_g s_g²/n_g.
    * Strata with k < 2, n ≤ k, or SSW = 0 emit NULL F. Output:
    * (stratum, n, k, f_micro). */
  def anovaF(df: DataFrame, stratumCol: String, groupCol: String,
             milliCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val y = col(milliCol).cast("long")
    val g = df.where(y.isNotNull && col(groupCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"), col(groupCol).as("g"))
      .agg(count(lit(1)).as("ng"), sum(y).as("sg"),
        sum(y.cast(dec) * y.cast(dec)).as("ssg"))
    // per-group ratio terms stay EXACT rationals until the stratum
    // fold: sum s_g²/n_g in fixed order via DECIMAL division is not
    // exact — instead keep Σ (s_g²·LCM-free) as float but in ONE
    // deterministic map-side-free aggregate: sort-order independence
    // requires the sum be exact, so compute s_g²/n_g per group row as
    // DOUBLE and sum via DECIMAL(38,6) quantization (deterministic
    // per group, exact addition)
    val ratio = (col("sg").cast("double") * col("sg").cast("double") /
      col("ng").cast("double"))
    val q6 = round(ratio * 1e6).cast(DecimalType(38, 0))
    val agg = g.groupBy("stratum").agg(
      sum("ng").as("n"), count(lit(1)).as("k"),
      sum("sg").as("s"), sum("ssg").as("ss"),
      sum(q6).as("ratio_q6"))
    def d(c: String) = col(c).cast("double")
    val ratioSum = col("ratio_q6").cast("double") / lit(1e6)
    val ssb = ratioSum - d("s") * d("s") / d("n")
    val ssw = d("ss") - ratioSum
    val f = (ssb / (d("k") - lit(1.0))) / (ssw / (d("n") - d("k")))
    agg.select(col("stratum"), col("n"), col("k"),
      when(col("k") >= 2 && col("n") > col("k") && ssw > 0,
        round(f * 1e6).cast("long")).as("f_micro"))
  }

  /** Cumulative gains / lift table: rows ranked by score descending,
    * cut into `bins` equal-population slices by the EXACT type-1 rank
    * rule (slice = (rank−1)·bins div n), per slice the positives and
    * the cumulative lift
    *   lift_micro = (cumPos·n·10⁶) div (cumN·P)
    * in pure integer arithmetic. Ranks come from distinct-value
    * cumulative counts (ties share the slice of their run's FIRST
    * rank — deterministic, no per-row window): a tie run starting at
    * global rank o+1 lands wholly in slice o·bins div n. The
    * model-targeting readout (top decile captures X× random).
    * Output: (slice, n, pos, cum_n, cum_pos, lift_micro). */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val rows = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("long").as("x"),
        col(labelCol).cast("boolean").cast("long").as("y"))
    val grouped = rows.groupBy("x")
      .agg(count(lit(1)).as("c"), sum("y").as("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // two-phase global rank (the giniByKey discipline — no global
    // window): percentile buckets over distinct scores, bucket
    // offsets folded driver-side (≤ p rows, metadata-scale), the
    // in-bucket prefix local to its bucket partition
    val bucketed =
      if (p == 1) grouped.withColumn("__b", lit(0))
      else {
        val bnds = grouped.agg(percentile_approx(col("x").cast("double"),
          typedlit((1 until p).map(_.toDouble / p)), lit(10000)).as("__bnds"))
        grouped.crossJoin(broadcast(bnds))
          .withColumn("__b", size(filter(col("__bnds"),
            b => b < col("x").cast("double"))))
          .drop("__bnds")
      }
    val offRows = bucketed.groupBy("__b").agg(sum("c").as("bc"))
      .collect().map(r => (r.getAs[Int]("__b"), r.getAs[Long]("bc")))
      .sortBy(_._1)
    val nTot = offRows.map(_._2).sum
    val offsets = {
      var acc = 0L
      offRows.map { case (b, bc) => val o = acc; acc += bc; (b, o) }.toSeq
    }.toDF("__b", "__off")
    val wIn = Window.partitionBy("__b").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.join(broadcast(offsets), Seq("__b"))
      .withColumn("cumIncl", col("__off") + sum("c").over(wIn))
      // rows STRICTLY greater than this run (desc-rank offset)
      .withColumn("o", lit(nTot) - col("cumIncl"))
    // total positives from the persisted distinct-score table — never
    // re-aggregate the raw rows (that would replan the whole source)
    val pTot = grouped.agg(coalesce(sum("p"), lit(0L))).as[Long].collect()(0)
    // ≤ bins slice rows: fold the cumulative sums driver-side (the
    // bucket-offset discipline above — metadata-scale, and it keeps
    // the triangular-join/window subtree out of the plan entirely)
    val sliceRows = cum
      .withColumn("slice", expr(s"(o * ${bins}L) div ${math.max(nTot, 1L)}L"))
      .groupBy("slice").agg(sum("c").as("n"), sum("p").as("pos"))
      .collect()
      .map(r => (r.getAs[Long]("slice"), r.getAs[Long]("n"),
        r.getAs[Long]("pos")))
      .sortBy(_._1)
    grouped.unpersist(false)
    var (cn, cp) = (0L, 0L)
    val folded = sliceRows.map { case (slice, n, pos) =>
      cn += n; cp += pos
      // all factors non-negative → BigInt quotient == truncating div
      val lift = if (pTot > 0)
        Some(((BigInt(cp) * nTot * 1000000L) /
          (BigInt(cn) * math.max(pTot, 1L))).toLong)
      else None
      (slice, n, pos, cn, cp, lift)
    }.toSeq
    folded.toDF("slice", "n", "pos", "cum_n", "cum_pos", "lift_micro")
  }

  /** Calibration (reliability) table for a scoring model: fixed-width
    * bins over a caller-declared [loMilli, hiMilli) score range, per
    * bin the exact count, positive count, and the observed positive
    * rate in integer micros (pos·10⁶ div n — no float ever). The
    * eval-side twin of a quality classifier ([[TextAnalytics]]'s
    * linear scorer): a well-calibrated model's rate_micro tracks the
    * bin midpoint. Out-of-range scores clamp to the edge bins (they
    * are evidence about the extremes, not discardable); NULL scores
    * or labels drop. One map-side-combined groupBy on ≤ `bins` keys —
    * nothing else. Empty bins emit explicit zero rows via a broadcast
    * bin spine, so the table shape is fixed. Output: (bin, lo_milli,
    * hi_milli, n, pos, rate_micro — NULL when the bin is empty). */
  def calibrationBins(df: DataFrame, scoreMilliCol: String,
                      labelCol: String, bins: Int,
                      loMilli: Long, hiMilli: Long): DataFrame = {
    require(bins >= 1 && hiMilli > loMilli,
      s"need bins >= 1 and lo < hi, got bins=$bins [$loMilli, $hiMilli)")
    val spark = df.sparkSession
    import spark.implicits._
    val span = hiMilli - loMilli
    // truncating vs flooring div differ only below zero — the clamp
    // to bin 0 swallows the difference on both engines
    val idx = expr(s"((CAST($scoreMilliCol AS BIGINT) - ${loMilli}L)" +
      s" * ${bins}L) div ${span}L")
    val bin = least(greatest(idx, lit(0L)), lit(bins - 1L))
    val counted = df
      .where(col(scoreMilliCol).isNotNull && col(labelCol).isNotNull)
      .select(bin.as("bin"),
        col(labelCol).cast("boolean").cast("long").as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"), sum("y").as("pos"))
    val spine = (0 until bins).map(b => (b.toLong,
      loMilli + span * b / bins, loMilli + span * (b + 1) / bins))
      .toDF("bin", "lo_milli", "hi_milli")
    broadcast(spine).join(counted, Seq("bin"), "left")
      .select(col("bin"), col("lo_milli"), col("hi_milli"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("pos"), lit(0L)).as("pos"),
        when(col("n").isNotNull,
          expr("(pos * 1000000L) div n")).as("rate_micro"))
  }

  /** Nearest-neighbor 1-D matching per stratum (caliper matching, the
    * covariate-balance step of an observational readout): each
    * treatment row matches the control value nearest to its own; ties
    * break LOW. Composed from two [[AsOfJoin.asOf]] merges — the
    * largest control ≤ x and (on the negated axis) the smallest
    * control ≥ x — so the plan is the linear union+window merge, never
    * a per-stratum quadratic join; deep strata cost O(|A| + |B|).
    * Output: (stratum, id, x, x_match, gap); x_match NULL only when
    * the stratum has no control rows at all. */
  def nearestMatch1d(treat: DataFrame, control: DataFrame,
                     stratumCol: String, valueCol: String,
                     idCol: String): DataFrame = {
    val a = treat.select(col(stratumCol).as("stratum"),
      col(idCol).cast("long").as("id"), col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull)
    val b = control.select(col(stratumCol).as("stratum"),
      col(valueCol).cast("long").as("bx"))
      .where(col("bx").isNotNull)
    val pred = AsOfJoin.asOf(a, "stratum", "x", "id",
      b.select(col("stratum").as("bstr"), col("bx"), col("bx").as("x_lo")),
      "bstr", "bx", "bx")
      .select(col("stratum"), col("id"), col("x"), col("x_lo"))
    val aNeg = a.select(col("stratum"), col("id"), col("x"),
      (-col("x")).as("xn"))
    val succ = AsOfJoin.asOf(aNeg, "stratum", "xn", "id",
      b.select(col("stratum").as("bstr"), (-col("bx")).as("bxn"),
        col("bx").as("x_hi")),
      "bstr", "bxn", "bxn")
      .select(col("stratum"), col("id"), col("x_hi"))
    pred.join(succ, Seq("stratum", "id"))
      .withColumn("x_match",
        when(col("x_lo").isNull, col("x_hi"))
          .when(col("x_hi").isNull, col("x_lo"))
          .when(col("x") - col("x_lo") <= col("x_hi") - col("x"), col("x_lo"))
          .otherwise(col("x_hi")))
      .select(col("stratum"), col("id"), col("x"), col("x_match"),
        abs(col("x") - col("x_match")).as("gap"))
  }

  /** Brown–Forsythe homogeneity-of-variance test (Levene's test with
    * MEDIAN centering — the robust default): are the groups' spreads
    * equal? Transform each row to its absolute deviation from the
    * group's exact type-1 median, then [[anovaF]] over the deviations
    * IS the statistic. Medians come from [[quantilesPerKey]]'s
    * distinct-count rank selection (integer-exact, hot keys pay
    * distinct values not rows); the median table is group-cardinality
    * bounded and broadcasts into the row-side join. Output: (n, k,
    * f_micro) — one row. */
  def brownForsythe(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val rows = df
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull && col("g").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = quantilesPerKey(rows, "g", "x", Seq(500000L))
      .select(col("key").as("g"), col("value").as("m"))
    val z = rows.join(broadcast(med), Seq("g"))
      .select(lit("all").as("all"), col("g"), abs(col("x") - col("m")).as("z"))
    val out = anovaF(z, "all", "g", "z").select("n", "k", "f_micro")
    val cached = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    rows.unpersist(false)
    cached
  }

  /** Method-of-moments Gumbel fit over calendar-month block maxima —
    * the extreme-value screen ("what does a 1-in-N-months peak look
    * like?"): per month the exact MAX of the value, then
    *   β̂ = s·√6/π,   μ̂ = x̄ − γ·β̂   (γ = Euler–Mascheroni)
    * from the maxima's exact integer moments (Σ, Σ² via DECIMAL;
    * sample variance over n−1). The block maxima are one map-side-
    * combined aggregate; the fit is one fixed-order float expression
    * over three exact integers → bit-stable micros. Blocks with
    * n < 2 emit NULL fit. Output: (n_blocks, mean_micro, beta_micro,
    * mu_micro) — one row; values in input units ×10⁻⁶. */
  def gumbelBlockMaxima(df: DataFrame, tsCol: String,
                        valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val blocks = df
      .select(date_trunc("month", col(tsCol)).as("block"),
        col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull && col("block").isNotNull)
      .groupBy("block").agg(max("x").as("mx"))
    val m = blocks.agg(count(lit(1)).as("n_blocks"),
      sum("mx").as("s"),
      sum(col("mx").cast(dec) * col("mx").cast(dec)).as("ss"))
    def d(c: String) = col(c).cast("double")
    val mean = d("s") / d("n_blocks")
    val varS = (d("ss") - d("s") * d("s") / d("n_blocks")) /
      (d("n_blocks") - lit(1.0))
    val beta = sqrt(varS * lit(6.0)) / lit(math.Pi)
    val mu = mean - lit(0.5772156649015329) * beta
    m.select(col("n_blocks"),
      when(col("n_blocks") >= 1, round(mean * 1e6).cast("long"))
        .as("mean_micro"),
      when(col("n_blocks") >= 2 && varS > 0,
        round(beta * 1e6).cast("long")).as("beta_micro"),
      when(col("n_blocks") >= 2 && varS > 0,
        round(mu * 1e6).cast("long")).as("mu_micro"))
  }

  /** Pairwise-complete Pearson correlation MATRIX over integer-valued
    * columns in ONE map-side-combined aggregate — the numeric-profile
    * screen beside [[graft.operators.KeyChecks.analyze]]: which
    * columns move together? Per unordered pair, exact moments (n over
    * rows where BOTH sides are non-null — pairwise-complete, the R
    * `use = "pairwise"` semantics — plus Σx, Σy, Σx², Σy², Σxy),
    * every pair in the same single scan (column-pair-count bounded,
    * like compositeKeys' level scan). The correlation
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²)·√(n·Σy² − Σy²))
    * closes driver-side in one fixed float order over the exact
    * integers → bit-stable micros. Degenerate pairs (n < 2 or a
    * zero-variance side) emit NULL. Callers pre-quantize float
    * columns to integer units (cents, bp, milli). Output:
    * (col_a, col_b, n, corr_micro), pair order = input order.
    *
    * SPLIT-LONG moment encoding (round 10, replacing DECIMAL(38,0) —
    * the r9-adjudicated "exactness tax", q255 at 21× its oracle):
    * each per-row product p = x·y (and x², y²) splits into
    * p = (p >> 20)·2²⁰ + (p & 0xFFFFF) — arithmetic shift is
    * floor-division, so the identity holds for negative p — and the
    * hi/lo halves integer-sum as plain LONGs (codegen'd, no
    * BigDecimal in the hot loop). The exact Σp reassembles
    * driver-side as BigInt(Σhi)·2²⁰ + Σlo; its double value is
    * IDENTICAL to the old decimal path's (same exact integer, same
    * round-to-nearest), so the oracle is unchanged. Headroom (split
    * point re-derived round 11 — the r10 31-bit split's BINDING bound
    * was the lo-sum, overflowing at ~2³² non-null rows, far below the
    * documented hi-sum figure): per-row products must fit a signed
    * long (|x·y| < 2⁶³ — quantized-unit inputs are orders below
    * this); the lo-sum (each lo < 2²⁰) binds at 2⁴³ ≈ 8.8·10¹² rows
    * per pair, and the hi-sum binds at Σ|p| < 2⁸³ ≈ 10²⁵ — both
    * beyond any 100 TB corpus of quantized ints; ANSI mode makes
    * every bound FAIL LOUDLY rather than wrap. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got $cols")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val x = col(a).cast("long"); val y = col(b).cast("long")
      val both = x.isNotNull && y.isNotNull
      def hiLo(p: org.apache.spark.sql.Column, tag: String) = Seq(
        coalesce(sum(when(both, shiftright(p, 20))), lit(0L))
          .as(s"__${tag}h_$i"),
        coalesce(sum(when(both, p.bitwiseAND(lit(0xFFFFFL)))), lit(0L))
          .as(s"__${tag}l_$i"))
      Seq(
        count(when(both, lit(1))).as(s"__n_$i"),
        coalesce(sum(when(both, x)), lit(0L)).as(s"__sx_$i"),
        coalesce(sum(when(both, y)), lit(0L)).as(s"__sy_$i")) ++
        hiLo(x * x, "xx") ++ hiLo(y * y, "yy") ++ hiLo(x * y, "xy")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = pairs.zipWithIndex.map { case ((a, b), i) =>
      val base = 9 * i
      val n = row.getLong(base)
      def joined(off: Int): Double =
        ((BigInt(row.getLong(base + off)) << 20) +
          BigInt(row.getLong(base + off + 1))).toDouble
      val sx = row.getLong(base + 1).toDouble
      val sy = row.getLong(base + 2).toDouble
      val sxx = joined(3); val syy = joined(5); val sxy = joined(7)
      val nd = n.toDouble
      val cov = nd * sxy - sx * sy
      val vx = nd * sxx - sx * sx
      val vy = nd * syy - sy * sy
      val corr: Option[Long] =
        if (n >= 2 && vx > 0 && vy > 0)
          Some(math.round(cov / (math.sqrt(vx) * math.sqrt(vy)) * 1e6))
        else None
      (a, b, n, corr)
    }
    out.toDF("col_a", "col_b", "n", "corr_micro")
  }

  /** Kruskal–Wallis H test (Kruskal & Wallis 1952) — the rank-based
    * one-way ANOVA, the nonparametric sibling of [[anovaF]] for
    * skewed/ordinal quality scores. Works per stratum over the groups
    * of `groupCol`.
    *
    * Exact-replay discipline: tied ranks are kept as INTEGER
    * double-ranks — for a distinct value with exclusive prefix count c
    * and multiplicity t, twice the average rank is the integer
    * 2c + t + 1 — so every per-group rank sum R2_g = Σ (2c+t+1) is an
    * exact BIGINT any engine reproduces. The float close
    *   H = Σ_g 3·R2_g²/(N(N+1)·n_g) − 3(N+1)
    * quantizes each GROUP's contribution to BIGINT micros before the
    * order-independent integer sum (the anovaF per-group-then-fold
    * pattern, at H's own small magnitude so no quantized term can
    * overflow), and the tie correction C = 1 − Σ(t³−t)/(N³−N) divides
    * the already-integral h_micro once at the end.
    *
    * Scale shape: one (stratum, value) cell aggregate, one
    * (stratum, group, value) cell aggregate, a cells-only window for
    * the prefix counts (value cardinality per stratum, never row
    * scale), and metadata-scale folds — no row ever carries a window.
    * Output: (stratum, n, k, h_micro, h_tied_micro). */
  def kruskalWallis(df: DataFrame, stratumCol: String, groupCol: String,
                    valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val v = col(valueCol).cast("long")
    val base = df.where(v.isNotNull && col(groupCol).isNotNull)
      .select(col(stratumCol).as("stratum"), col(groupCol).as("g"),
        v.as("v"))
    // the ONE row-scale exchange: (stratum, group, value) cells; the
    // value cells derive from them, so every downstream exchange is
    // value-cardinality, never row-cardinality
    val gv = base.groupBy("stratum", "g", "v").agg(count(lit(1)).as("m"))
      .localCheckpoint(false)
    // per-(stratum, value) multiplicity t and exclusive prefix count c
    val cells = gv.groupBy("stratum", "v").agg(sum("m").as("t"))
      .withColumn("c",
        coalesce(sum("t").over(Window.partitionBy("stratum").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("rank2", lit(2L) * col("c") + col("t") + lit(1L))
    val groups = gv.join(cells.select("stratum", "v", "rank2"),
        Seq("stratum", "v"))
      .groupBy("stratum", "g")
      .agg(sum("m").as("ng"),
        sum(col("m").cast(dec) * col("rank2").cast(dec)).as("r2g"))
    // each group's H contribution 3·R2_g²/(N(N+1)·n_g) is
    // micro-quantized pre-sum (anovaF's per-group-then-exact-fold
    // pattern, at H's own magnitude so the micros stay BIGINT-safe);
    // h_micro = Σ terms − 3(N+1)·1e6 is then pure integer arithmetic.
    // N and k attach via a window over the GROUP-scale frame (bounded
    // by stratum×group cardinality) — an agg+re-join would duplicate
    // the whole groups subtree in the plan
    val wS = Window.partitionBy("stratum")
    val withNk = groups
      .withColumn("n", sum("ng").over(wS))
      .withColumn("k", count(lit(1)).over(wS))
    def d(c: String) = col(c).cast("double")
    val nd = d("n")
    val term = round(lit(3.0) * col("r2g").cast("double") *
      col("r2g").cast("double") /
      (nd * (nd + lit(1.0)) * col("ng").cast("double")) * 1e6)
      .cast("long")
    val g = withNk.groupBy("stratum").agg(
      max("n").as("n"), max("k").as("k"),
      sum(term).as("h_plus_micro"))
    val ties = cells.groupBy("stratum").agg(
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec) -
        col("t").cast(dec)).as("tie_sum"))
    val hMicro = col("h_plus_micro") -
      lit(3L) * (col("n") + lit(1L)) * lit(1000000L)
    val cFac = lit(1.0) - col("tie_sum").cast("double") / (nd * nd * nd - nd)
    g.join(ties, Seq("stratum"))
      .select(col("stratum"), col("n"), col("k"),
        when(col("k") >= 2 && col("n") > col("k"),
          hMicro).as("h_micro"),
        when(col("k") >= 2 && col("n") > col("k") && cFac > 0,
          round(hMicro.cast("double") / cFac).cast("long"))
          .as("h_tied_micro"))
  }

  /** Cliff's delta (Cliff 1993, "Dominance statistics") per stratum —
    * the distribution-free effect size companion to [[mannWhitneyU]]:
    *   δ = P(X > Y) − P(X < Y) = (#gt − #lt) / (n_a·n_b)
    * over all cross-group pairs, read directly as stochastic
    * dominance (δ = ±1 total separation, 0 overlap). Computed from
    * per-group VALUE CELLS — a cells×cells join bounded by the value
    * domains (pre-bucket continuous columns), never n_a·n_b row
    * pairs. The pre-bucket contract is ENFORCED: the operator counts
    * the distinct cells (materializing the checkpoint the join reuses,
    * so the guard job is not wasted work) and fails fast with a clear
    * message when they exceed `maxCells` — a raw continuous column
    * would otherwise silently plan a 10¹²-pair nested-loop join.
    * #gt/#lt are exact DECIMAL integers; one double division closes
    * the micros. Output: (stratum, delta_micro, n_pairs) with
    * n_pairs = n_a·n_b. */
  def cliffsDelta(df: DataFrame, stratumCol: String, groupCol: String,
                  aName: String, bName: String,
                  valueCol: String, maxCells: Int = 1 << 16): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df
      .where(col(valueCol).isNotNull &&
        col(groupCol).isin(aName, bName))
      .groupBy(col(stratumCol).as("stratum"), col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"cliffsDelta: $nCells distinct (stratum, group, value) cells " +
        s"exceed maxCells=$maxCells; pre-bucket $valueCol (the scaladoc " +
        "contract) or raise maxCells explicitly")
    val a = cells.where(col("g") === aName)
      .select(col("stratum"), col("v").as("va"), col("c").cast(dec).as("ca"))
    val b = cells.where(col("g") === bName)
      .select(col("stratum"), col("v").as("vb"), col("c").cast(dec).as("cb"))
    val pairs = a.join(b, Seq("stratum"))
      .groupBy("stratum")
      .agg(
        coalesce(sum(when(col("va") > col("vb"), col("ca") * col("cb"))),
          lit(0).cast(dec)).as("gt"),
        coalesce(sum(when(col("va") < col("vb"), col("ca") * col("cb"))),
          lit(0).cast(dec)).as("lt"),
        sum(col("ca") * col("cb")).as("nn"))
    def d(c: String) = col(c).cast("double")
    pairs
      // nn = n_a·n_b exactly (every cell pair contributes ca·cb)
      .select(col("stratum"),
        round((d("gt") - d("lt")) / d("nn") * 1e6).cast("long")
          .as("delta_micro"),
        col("nn").cast("long").as("n_pairs"))
  }

  /** Kendall's τ-b rank correlation (Kendall 1945, with the tie
    * correction) between two INTEGER-VALUED columns, computed from
    * the JOINT CONTINGENCY CELLS instead of row pairs: concordant /
    * discordant mass is Σ n_ab·n_a'b' over cell pairs with a<a' and
    * b≷b' — a cells×cells join bounded by the VALUE DOMAINS (callers
    * pre-bucket continuous columns; the corrMatrix contract — and the
    * contract is ENFORCED: a distinct-cell count over `maxCells` fails
    * fast instead of silently planning a 10¹²-pair nested-loop join;
    * the count materializes the checkpoint the join reuses), never
    * the O(n²) row-pair blowup. [[spearmanByKey]] ranks rows; τ-b is
    * the pair-concordance view, robust to monotone transforms and
    * the standard effect size for ordinal×ordinal tables.
    *
    *   τ_b = (C − D) / √((n₀ − n₁)(n₀ − n₂)),
    * n₀ = n(n−1)/2, n₁/n₂ = Σ t(t−1)/2 over each margin's ties. C,
    * D, and all tie sums are EXACT integers (DECIMAL(38,0)); one
    * IEEE √ close → deterministic micros.
    * Output: one row (n, concordant, discordant, tau_micro). */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String,
                  maxCells: Int = 1 << 16): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"kendallTauB: $nCells distinct ($xCol, $yCol) cells exceed " +
        s"maxCells=$maxCells; pre-bucket the continuous column (the " +
        "scaladoc contract) or raise maxCells explicitly")
    val a = cells.select(col("x").as("xa"), col("y").as("ya"),
      col("c").cast(dec).as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"),
      col("c").cast(dec).as("cb"))
    val pairs = a.join(b, col("xa") < col("xb"))
      .agg(
        coalesce(sum(when(col("yb") > col("ya"),
          col("ca") * col("cb"))), lit(0).cast(dec)).as("cc"),
        coalesce(sum(when(col("yb") < col("ya"),
          col("ca") * col("cb"))), lit(0).cast(dec)).as("dd"))
    val tx = cells.groupBy("x").agg(sum("c").as("t"))
      .agg(coalesce(sum(col("t").cast(dec) * (col("t").cast(dec) - 1)),
        lit(0).cast(dec)).as("tx2"), sum("t").as("n"))
    val ty = cells.groupBy("y").agg(sum("c").as("t"))
      .agg(coalesce(sum(col("t").cast(dec) * (col("t").cast(dec) - 1)),
        lit(0).cast(dec)).as("ty2"))
    def d(c: String) = col(c).cast("double")
    val n0x2 = d("n") * (d("n") - lit(1.0)) // 2·n0
    val denom = sqrt((n0x2 - d("tx2")) * (n0x2 - d("ty2"))) / lit(2.0)
    val tau = (d("cc") - d("dd")) / denom
    pairs.crossJoin(tx).crossJoin(ty)
      .select(col("n"),
        col("cc").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"),
        when(col("n") >= 2 && (n0x2 - d("tx2")) > 0 &&
          (n0x2 - d("ty2")) > 0,
          round(tau * 1e6).cast("long")).as("tau_micro"))
  }

  /** Split-conformal prediction threshold (Vovk et al. 2005; Lei et
    * al. 2018, "Distribution-free predictive inference"): per group,
    * the k-th smallest nonconformity score with
    *   k = min(n, ⌈(n+1)·(1−α)⌉)
    * — the finite-sample-valid cutoff giving ≥ (1−α) marginal
    * coverage on exchangeable data. The model-deployment calibration
    * step after [[calibrationBins]] measures and before anything
    * promises coverage.
    *
    * Exact: k in pure integer ppm arithmetic (⌈x/10⁶⌉ as
    * (x + 10⁶−1) div 10⁶ — non-negative, engine-agnostic), and the
    * k-th order statistic selected from VALUE CELLS (distinct-value
    * counts + cumulative window — value-cardinality, never row-scale
    * windows; the quantilesPerKey posture), which also makes the
    * selected value tie-proof by construction.
    * Output: (group, n, k, threshold). */
  def conformalThreshold(df: DataFrame, groupCol: String,
                         scoreCol: String, alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L,
      s"alphaPpm must be in (0, 1e6), got $alphaPpm")
    val q = 1000000L - alphaPpm
    val cells = df.where(col(scoreCol).isNotNull)
      .groupBy(col(groupCol).as("group"),
        col(scoreCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("group").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("group")
    val ranked = cells
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .withColumn("k", least(col("n"),
        expr(s"((n + 1L) * ${q}L + 999999L) div 1000000L")))
    ranked.where(col("cum") >= col("k"))
      .groupBy("group")
      .agg(max("n").as("n"), max("k").as("k"),
        min("v").as("threshold"))
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) per
    * key — [[kaplanMeier]]'s additive sibling (H(t) = Σ_{tᵢ≤t}
    * dᵢ/nᵢ): the estimator of choice when hazard RATES are compared
    * or fed to downstream models (KM's product form compounds
    * multiplicatively). Same cells as KM: per event time the deaths
    * dᵢ and the at-risk count nᵢ (a descending-time cumulative over
    * the duration cells — value-cardinality windows only). Each
    * per-time term dᵢ·10⁶/nᵢ is micro-quantized BEFORE the exact
    * integer cumulative sum (the q219 per-term discipline).
    * Output: (key, t, n_risk, d, h_micro) at event times. */
  def nelsonAalen(df: DataFrame, keyCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val rows = df.select(col(keyCol).as("key"),
        col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").cast("long").as("e"))
      .where(col("t").isNotNull && col("t") >= 0 && col("e").isNotNull)
    val cells = rows.groupBy("key", "t")
      .agg(count(lit(1)).as("c"), sum("e").as("d"))
    val wGe = Window.partitionBy("key").orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = cells.withColumn("n_risk", sum("c").over(wGe))
      .where(col("d") > 0)
    val term = round(col("d").cast("double") * 1e6 /
      col("n_risk").cast("double")).cast("long")
    val wCum = Window.partitionBy("key").orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    atRisk.withColumn("__term", term)
      .select(col("key"), col("t"), col("n_risk"), col("d"),
        sum("__term").over(wCum).as("h_micro"))
  }

  /** Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995,
    * "Controlling the false discovery rate"): given m tests with
    * micro-unit p-values, reject the k* smallest where k* = max{k :
    * p₍ₖ₎ ≤ k·α/m} — the multiple-testing gate every per-key test in
    * this file feeds when run across thousands of strata. PURE
    * integer arithmetic: the step-up condition is evaluated as
    * p_micro·m ≤ rank·alpha_micro (exact BIGINTs, no division), so
    * the reject set replays exactly in any engine.
    *
    * Ties in p break by test id (deterministic ranks); rejection is
    * by rank ≤ k*, so equal-p tests straddling k* resolve
    * deterministically too. The windows run over the TEST list —
    * m rows, metadata-scale by construction.
    * Output: (test, p_micro, rank, reject). */
  def bhFdr(df: DataFrame, testCol: String, pMicroCol: String,
            alphaMicro: Long): DataFrame = {
    require(alphaMicro >= 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in [0, 1e6], got $alphaMicro")
    val w = Window.orderBy(col("p_micro"), col("test"))
    val all = Window.partitionBy()
    val ranked = df
      .select(col(testCol).as("test"),
        col(pMicroCol).cast("long").as("p_micro"))
      .withColumn("rank", row_number().over(w))
      .withColumn("m", count(lit(1)).over(all))
    val kstar = max(when(
      col("p_micro") * col("m") <= col("rank") * lit(alphaMicro),
      col("rank")).otherwise(lit(0L))).over(all)
    ranked
      .withColumn("reject", col("rank") <= kstar)
      .select(col("test"), col("p_micro"),
        col("rank").cast("long").as("rank"), col("reject"))
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955) for a
    * DOSE-ORDERED proportion drift: strata carry integer dose scores
    * w_i, per-stratum totals n_i and successes r_i; the statistic's
    * numerator T = Σ w_i·(r_i·N − n_i·R) and variance pieces are
    * EXACT integers (DECIMAL(38,0) accumulation), with one IEEE
    * close z = T / √(p̄(1−p̄)·N·(N·Σw²n − (Σwn)²)) micro-rounded.
    * The monotone-drift sibling of [[proportionsZ]] (two groups) and
    * [[mannKendallDaily]] (continuous): is the success rate RISING
    * with the ordered bucket?
    * Input: one row per observation; `doseCol` integral. Output: one
    * row (n, k_doses, t_num, z_micro). */
  def cochranArmitage(df: DataFrame, doseCol: String,
                      successCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val wI = col(doseCol).cast("long")
    val sI = col(successCol).cast("boolean")
    val cells = df.where(wI.isNotNull && sI.isNotNull)
      .groupBy(wI.as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(sI, 1L).otherwise(0L)).as("r"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    // totals attach via a window over the k-row dose-cell frame
    // (metadata scale), so T's per-cell terms stay exact integers
    val wAll = Window.partitionBy()
    val cells2 = cells
      .withColumn("tot_n", sum("n").over(wAll))
      .withColumn("tot_r", sum("r").over(wAll))
    val agg = cells2.agg(
      max("tot_n").cast(dec).as("nn"), max("tot_r").cast(dec).as("rr"),
      count(lit(1)).as("k"),
      sum(col("w").cast(dec) * col("n").cast(dec)).as("swn"),
      sum(col("w").cast(dec) * col("w").cast(dec) * col("n").cast(dec))
        .as("swwn"),
      sum(col("w").cast(dec) *
        (col("r").cast(dec) * col("tot_n").cast(dec) -
          col("n").cast(dec) * col("tot_r").cast(dec)))
        .as("t_num"))
    agg.select(col("nn").cast("long").as("n"), col("k"),
      col("t_num").cast("long").as("t_num"),
      {
        val nD = d(col("nn")); val rD = d(col("rr"))
        val pbar = rD / nD
        val vr = pbar * (lit(1.0) - pbar) * nD *
          (nD * d(col("swwn")) - d(col("swn")) * d(col("swn")))
        when(vr > 0,
          round(d(col("t_num")) / sqrt(vr) * 1e6).cast("long"))
          .as("z_micro")
      })
  }

  /** Jarque–Bera normality test (Jarque & Bera 1980) per key, from
    * exact integer power sums: callers pre-quantize to integer units
    * (the corrMatrix contract) and keep |x| small enough that Σx⁴
    * fits DECIMAL(38,0) — the aggregate itself is overflow-checked.
    * The float close (central moments → skewness, excess kurtosis,
    * JB = n/6·(S² + (K−3)²/4)) runs in ONE fixed expression shape
    * over the exact sums: +, −, ×, ÷, √ are all IEEE
    * correctly-rounded, so any engine replays the micros
    * bit-identically. Output: (key, n, skew_micro, kurt_micro,
    * jb_micro); NULL micros for n < 2 or zero variance. */
  def jarqueBera(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = col(valueCol).cast("long").cast(dec)
    val g = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"), sum(x).as("s1"),
        sum(x * x).as("s2"), sum(x * x * x).as("s3"),
        sum(x * x * x * x).as("s4"))
    def d(c: String) = col(c).cast("double")
    val nd = d("n")
    val m1 = d("s1") / nd
    val m2 = d("s2") / nd - m1 * m1
    val m3 = d("s3") / nd - lit(3.0) * m1 * (d("s2") / nd) +
      lit(2.0) * m1 * m1 * m1
    val m4 = d("s4") / nd - lit(4.0) * m1 * (d("s3") / nd) +
      lit(6.0) * m1 * m1 * (d("s2") / nd) - lit(3.0) * m1 * m1 * m1 * m1
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2)
    val jb = nd / lit(6.0) *
      (skew * skew + lit(0.25) * (kurt - lit(3.0)) * (kurt - lit(3.0)))
    val ok = col("n") >= 2 && m2 > 0
    g.select(col("key"), col("n"),
      when(ok, round(skew * 1e6).cast("long")).as("skew_micro"),
      when(ok, round(kurt * 1e6).cast("long")).as("kurt_micro"),
      when(ok, round(jb * 1e6).cast("long")).as("jb_micro"))
  }

  /** ROC AUC per stratum, EXACT from value cells — the Mann–Whitney
    * identity (Hanley & McNeil 1982, "The meaning and use of the area
    * under a ROC curve"): AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻) over all
    * positive×negative pairs, computed as Σ c⁺·c⁻ over score-CELL
    * pairs (never row pairs; the [[cliffsDelta]] machinery with ties
    * counted half). (2·gt + eq) and 2·n⁺·n⁻ are exact DECIMAL
    * integers; ONE double division closes auc_micro. Pre-bucket
    * contract enforced via `maxCells` like the other cell joins.
    * Output: (stratum, n_pos, n_neg, auc_micro — NULL when either
    * class is empty). */
  def rocAuc(df: DataFrame, stratumCol: String, labelCol: String,
             scoreCol: String, maxCells: Int = 1 << 16): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"),
        col(labelCol).cast("boolean").as("y"),
        col(scoreCol).cast("long").as("s"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val nCells = cells.count()
    require(nCells <= maxCells,
      s"rocAuc: $nCells distinct (stratum, label, score) cells exceed " +
        s"maxCells=$maxCells; pre-bucket $scoreCol or raise maxCells")
    val p = cells.where(col("y"))
      .select(col("stratum"), col("s").as("sp"), col("c").cast(dec).as("cp"))
    val n = cells.where(!col("y"))
      .select(col("stratum"), col("s").as("sn"), col("c").cast(dec).as("cn"))
    val pairs = p.join(n, Seq("stratum"))
      .groupBy("stratum")
      .agg(
        coalesce(sum(when(col("sp") > col("sn"), col("cp") * col("cn"))),
          lit(0).cast(dec)).as("gt"),
        coalesce(sum(when(col("sp") === col("sn"), col("cp") * col("cn"))),
          lit(0).cast(dec)).as("eq"),
        sum(col("cp") * col("cn")).as("nn"))
    val sizes = cells.groupBy("stratum").agg(
      coalesce(sum(when(col("y"), col("c"))), lit(0L)).as("n_pos"),
      coalesce(sum(when(!col("y"), col("c"))), lit(0L)).as("n_neg"))
    def d(c: String) = col(c).cast("double")
    sizes.join(pairs, Seq("stratum"), "left")
      .select(col("stratum"), col("n_pos"), col("n_neg"),
        when(col("n_pos") >= 1 && col("n_neg") >= 1,
          round((lit(2.0) * d("gt") + d("eq"))
            / (lit(2.0) * d("nn")) * 1e6).cast("long")).as("auc_micro"))
  }

  /** Cohen's κ (Cohen 1960, "A coefficient of agreement for nominal
    * scales") between two categorical raters, from the joint
    * CONTINGENCY CELLS: κ = (p_o − p_e)/(1 − p_e) with chance
    * agreement p_e from the margins. Closed exactly as ONE integer
    * rational — κ = (n·agree − Σ_k row_k·col_k) / (n² − Σ_k
    * row_k·col_k) in DECIMAL(38,0) — then one double division to
    * micros; NULL when the margins force p_e = 1 (both raters
    * constant). The one-number summary over [[q227]]-style confusion
    * matrices (rater QA for annotation / weak-label pipelines).
    * Output: one row (n, agree, kappa_micro). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df
      .where(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val ra = cells.groupBy("a").agg(sum("c").as("rc"))
    val cb = cells.groupBy("b").agg(sum("c").as("cc"))
    val pe = ra.join(cb, col("a") === col("b"))
      .agg(coalesce(sum(col("rc").cast(dec) * col("cc").cast(dec)),
        lit(0).cast(dec)).as("pe_num"))
    val tot = cells.agg(
      coalesce(sum("c"), lit(0L)).as("n"),
      coalesce(sum(when(col("a") === col("b"), col("c")).otherwise(0L)),
        lit(0L)).as("agree"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    tot.crossJoin(pe)
      .select(col("n"), col("agree"),
        when(d(col("n")) * d(col("n")) - d(col("pe_num")) > 0,
          round((d(col("n")) * d(col("agree")) - d(col("pe_num")))
            / (d(col("n")) * d(col("n")) - d(col("pe_num"))) * 1e6)
            .cast("long")).as("kappa_micro"))
  }

  /** Fleiss' κ (Fleiss 1971, "Measuring nominal scale agreement among
    * many raters"): agreement among a FIXED number r of raters per
    * item, from the (item, category) count cells n_ik:
    *   P̄ = (Σ_ik n_ik² − N·r) / (N·r·(r−1)),  p_k = Σ_i n_ik/(N·r),
    *   P_e = Σ_k p_k²,  κ = (P̄ − P_e)/(1 − P_e)
    * closed as ONE exact integer rational — κ = (A·(T₂ − A) − B·S) /
    * (B·(A² − S)) with A = N·r, B = r−1, T₂ = Σ n_ik², S = Σ_k c_k² —
    * then one double division to micros. Requires every item to carry
    * the same rater count (enforced); NULL when A² = S (all raters
    * always one category). Output: one row (n_items, n_raters,
    * kappa_micro). */
  def fleissKappa(df: DataFrame, itemCol: String,
                  catCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df
      .where(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(catCol).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val perItem = cells.groupBy("item").agg(
      sum("c").as("r"),
      sum(col("c").cast(dec) * col("c").cast(dec)).as("t2i"))
    val rChk = perItem.agg(min("r").as("rmin"), max("r").as("rmax"),
      count(lit(1)).as("ni"),
      coalesce(sum("t2i"), lit(0).cast(dec)).as("t2"))
    val perCat = cells.groupBy("k").agg(sum("c").as("ck"))
      .agg(coalesce(sum(col("ck").cast(dec) * col("ck").cast(dec)),
        lit(0).cast(dec)).as("s2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    rChk.crossJoin(perCat)
      .select(col("ni").as("n_items"),
        when(col("rmin") === col("rmax"), col("rmin"))
          .otherwise(raise_error(concat(
            lit("fleissKappa: rater counts differ across items ("),
            col("rmin"), lit(" vs "), col("rmax"),
            lit("); Fleiss requires a fixed r"))).cast("long"))
          .as("n_raters"),
        when(col("rmax") >= 2 &&
          d(col("ni")) * d(col("rmax")) * d(col("ni")) * d(col("rmax"))
            - d(col("s2")) > 0,
          round((d(col("ni")) * d(col("rmax"))
              * (d(col("t2")) - d(col("ni")) * d(col("rmax")))
            - (d(col("rmax")) - lit(1.0)) * d(col("s2")))
            / ((d(col("rmax")) - lit(1.0))
              * (d(col("ni")) * d(col("rmax")) * d(col("ni"))
                 * d(col("rmax")) - d(col("s2")))) * 1e6)
            .cast("long")).as("kappa_micro"))
  }

  /** Log-rank test (Mantel 1966; Peto & Peto 1972) comparing two
    * groups' survival over right-censored (duration, event) rows —
    * the hypothesis-test companion to [[kaplanMeier]] (which draws
    * the curves this decides between). At each distinct event time:
    * hypergeometric expectation E₁ = d·n₁/n and variance
    * V = d·(n₁/n)·(1 − n₁/n)·(n − d)/(n − 1) from the EXACT integer
    * at-risk/death counts (cells + a descending-cumulative window —
    * the kaplanMeier shape, one per group side); per-time terms are
    * micro-rounded in one fixed float order and integer-summed (the
    * ljungBox discipline), then z = (O₁ − E₁)/√V closes. Output: one
    * row (n_a, n_b, o1, e1_micro, v_micro, z_micro — NULL z when
    * V = 0). */
  def logRank(df: DataFrame, groupCol: String, groupA: String,
              groupB: String, durationCol: String,
              eventCol: String): DataFrame = {
    val rows = df
      .where(col(groupCol).isin(groupA, groupB) &&
        col(durationCol).isNotNull && col(durationCol) >= 0 &&
        col(eventCol).isNotNull)
      .select(when(col(groupCol) === groupA, lit(1L)).otherwise(lit(0L))
          .as("g1"),
        col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").cast("long").as("e"))
    val cells = rows.groupBy("t").agg(
      sum("g1").as("c1"), sum(lit(1L) - col("g1")).as("c2"),
      sum(col("g1") * col("e")).as("d1"),
      sum((lit(1L) - col("g1")) * col("e")).as("d2"))
    val wGe = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = cells
      .withColumn("n1", sum("c1").over(wGe))
      .withColumn("n2", sum("c2").over(wGe))
      .where(col("d1") + col("d2") > 0)
    def d(c: String) = col(c).cast("double")
    val dd = d("d1") + d("d2")
    val nn = d("n1") + d("n2")
    val e1t = dd * d("n1") / nn
    val vt = when(nn > 1,
      dd * (d("n1") / nn) * (lit(1.0) - d("n1") / nn) *
        (nn - dd) / (nn - lit(1.0))).otherwise(lit(0.0))
    val terms = atRisk.select(col("d1"), col("c1"), col("c2"),
      round(e1t * 1e6).cast("long").as("e1m"),
      round(vt * 1e6).cast("long").as("vm"))
    val totals = rows.agg(
      coalesce(sum("g1"), lit(0L)).as("n_a"),
      coalesce(sum(lit(1L) - col("g1")), lit(0L)).as("n_b"))
    val agg = terms.agg(
      coalesce(sum("d1"), lit(0L)).as("o1"),
      coalesce(sum("e1m"), lit(0L)).as("e1_micro"),
      coalesce(sum("vm"), lit(0L)).as("v_micro"))
    totals.crossJoin(agg)
      .select(col("n_a"), col("n_b"), col("o1"), col("e1_micro"),
        col("v_micro"),
        when(col("v_micro") > 0,
          round((col("o1").cast("double") -
            col("e1_micro").cast("double") / 1e6)
            / sqrt(col("v_micro").cast("double") / 1e6) * 1e6)
            .cast("long")).as("z_micro"))
  }

  /** Friedman test (Friedman 1937, "The use of ranks to avoid the
    * assumption of normality") — k related treatments ranked WITHIN
    * each of n blocks (the repeated-measures companion of
    * [[kruskalWallis]]): with doubled average ranks r₂ (exact under
    * ties, the [[spearmanByKey]] device),
    *   Q = (k−1) · Σ_j (R₂_j − n(k+1))² / (Σ_ij r₂² − n·k·(k+1)²)
    * — the tie-corrected general form (Conover; reduces to the
    * textbook 12/(nk(k+1))·Σ(R_j − n(k+1)/2)² when untied — the
    * hand-check that caught an n× coefficient slip in the first cut
    * of BOTH engines); every moment an exact integer
    * (DECIMAL), one double division closes q_micro. Blocks are
    * k-bounded, so ranking runs IN-ROW over a per-block collect
    * (O(k²) per block, k = treatments — metadata-scale by
    * construction); no windows. Every block must carry the same k
    * treatments exactly once (enforced). Output: one row (n_blocks,
    * k, q_micro — NULL when the rank variance is 0, i.e. all-tied). */
  def friedman(df: DataFrame, blockCol: String, treatmentCol: String,
               valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df
      .where(col(valueCol).isNotNull)
      .select(col(blockCol).as("b"), col(treatmentCol).cast("string").as("tr"),
        col(valueCol).cast("long").as("v"))
    val blocks = rows.groupBy("b")
      .agg(collect_list(struct(col("tr"), col("v"))).as("xs"),
        count_distinct(col("tr")).as("ndt"), count(lit(1)).as("nr"))
    // doubled average rank 2·(#smaller) + (#ties incl self) + 1; the
    // repeated-treatment guard rides the CONSUMED rs column (an
    // unused check column would be pruned and never fire)
    val rsExpr = when(col("ndt") =!= col("nr"),
      raise_error(lit("friedman: a block repeats a treatment"))
        .cast("array<struct<tr:string,r2:bigint>>"))
      .otherwise(expr(
        """transform(xs, __e -> named_struct(
          |  'tr', __e.tr,
          |  'r2', CAST(2 * size(filter(xs, __f -> __f.v < __e.v))
          |        + size(filter(xs, __f -> __f.v = __e.v)) + 1 AS BIGINT)))"""
          .stripMargin))
    val exploded = blocks
      .select(col("b"), col("nr"), explode(rsExpr).as("e"))
      .select(col("b"), col("nr"), col("e.tr").as("tr"),
        col("e.r2").cast(dec).as("r2"))
      .localCheckpoint(false)
    // block count / treatment count are metadata-scale: collect once
    // (the codebook-collect precedent) and close with plan literals
    val kRow = exploded.groupBy("b").agg(max("nr").as("k"))
      .agg(min("k"), max("k"), count(lit(1))).head()
    val (kmin, kmax, nB) = (kRow.getLong(0), kRow.getLong(1), kRow.getLong(2))
    require(kmin == kmax,
      s"friedman: block sizes differ ($kmin vs $kmax); every block " +
        "must carry the same k treatments")
    val k = kmax
    val perT = exploded.groupBy("tr").agg(sum("r2").as("rj"))
    val num = perT.agg(coalesce(sum(
      (col("rj") - lit(nB * (k + 1)).cast(dec))
        * (col("rj") - lit(nB * (k + 1)).cast(dec))), lit(0).cast(dec))
      .as("num"))
    val s2 = exploded.agg(coalesce(sum(col("r2") * col("r2")),
      lit(0).cast(dec)).as("s2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    num.crossJoin(s2)
      .select(lit(nB).as("n_blocks"), lit(k).as("k"),
        when(d(col("s2")) - lit(nB.toDouble) * lit(k.toDouble)
            * lit((k + 1).toDouble) * lit((k + 1).toDouble) > 0,
          round(lit((k - 1).toDouble) * d(col("num"))
            / (d(col("s2")) - lit(nB.toDouble) * lit(k.toDouble)
              * lit((k + 1).toDouble) * lit((k + 1).toDouble))
            * 1e6).cast("long")).as("q_micro"))
  }

  /** Murphy decomposition of the (binned) Brier score (Murphy 1973,
    * "A new vector partition of the probability score"):
    *   Brier = REL − RES + UNC,
    *   REL = Σ_k n_k(p̄_k − ō_k)²/N   (calibration error),
    *   RES = Σ_k n_k(ō_k − ō)²/N     (discrimination),
    *   UNC = ō(1 − ō)                (irreducible base-rate term)
    * over the same clamp-binned score cells [[calibrationBins]]
    * draws — this is its one-row quantitative summary. Per-bin score
    * sums and event counts are exact integers; per-bin terms
    * micro-round in one fixed float order and integer-sum (the
    * ljungBox discipline), so both engines agree bit-for-bit.
    * Output: one row (n, rel_micro, res_micro, unc_micro,
    * brier_micro = rel − res + unc). */
  def brierDecomposition(df: DataFrame, scoreMilliCol: String,
                         labelCol: String, bins: Int,
                         loMilli: Long, hiMilli: Long): DataFrame = {
    require(bins >= 1 && hiMilli > loMilli,
      s"need bins >= 1 and lo < hi, got bins=$bins [$loMilli, $hiMilli)")
    val dec = DecimalType(38, 0)
    val span = hiMilli - loMilli
    val idx = expr(s"((CAST($scoreMilliCol AS BIGINT) - ${loMilli}L)" +
      s" * ${bins}L) div ${span}L")
    val bin = least(greatest(idx, lit(0L)), lit(bins - 1L))
    val cells = df
      .where(col(scoreMilliCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("nk"),
        sum(col(scoreMilliCol).cast("long").cast(dec)).as("sp"),
        sum(col(labelCol).cast("boolean").cast("long").cast(dec)).as("so"))
      .localCheckpoint(false)
    val tot = cells.agg(coalesce(sum("nk"), lit(0L)).as("n"),
      coalesce(sum("so"), lit(0).cast(dec)).as("o")).head()
    val n = tot.getLong(0)
    val oAll: Double =
      if (tot.isNullAt(1)) 0.0 else tot.getDecimal(1).doubleValue()
    if (n == 0) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq((0L, 0L, 0L, 0L, 0L))
        .toDF("n", "rel_micro", "res_micro", "unc_micro", "brier_micro")
        .limit(0)
    }
    val oBar = oAll / n
    def d(c: String) = col(c).cast("double")
    // p̄_k in [0,1]: score milli / 1000; per-bin terms → micro, summed
    val relT = round((d("sp") / d("nk") / 1000.0 - d("so") / d("nk"))
      * (d("sp") / d("nk") / 1000.0 - d("so") / d("nk"))
      * d("nk") / lit(n.toDouble) * 1e6).cast("long")
    val resT = round((d("so") / d("nk") - lit(oBar))
      * (d("so") / d("nk") - lit(oBar))
      * d("nk") / lit(n.toDouble) * 1e6).cast("long")
    val agg = cells.agg(
      coalesce(sum(relT), lit(0L)).as("rel_micro"),
      coalesce(sum(resT), lit(0L)).as("res_micro"))
    val unc = math.round(oBar * (1.0 - oBar) * 1e6)
    agg.select(lit(n).as("n"), col("rel_micro"), col("res_micro"),
      lit(unc).as("unc_micro"),
      (col("rel_micro") - col("res_micro") + lit(unc)).as("brier_micro"))
  }

  /** Krippendorff's α for NOMINAL data (Krippendorff 1970/2004) —
    * the agreement coefficient that, unlike [[cohensKappa]] (2
    * raters) and [[fleissKappa]] (fixed r, no missing), tolerates
    * VARIABLE rater counts per item: items with r_i ≥ 2 pairable
    * values contribute; α = 1 − D_o/D_e with
    *   D_o = Σ_i Σ_c n_ic(r_i − n_ic)/(r_i − 1) / n,
    *   D_e = Σ_c n_c(n − n_c) / (n(n − 1)).
    * Per-item disagreement terms micro-round in one fixed float
    * order and integer-sum (variable r_i denominators make a single
    * exact rational impractical; the ljungBox discipline applies);
    * D_e stays exact integer. Output: one row (n_values, n_items,
    * alpha_micro — NULL when D_e = 0, i.e. one category total). */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        catCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    // one (item, cat) cell aggregate, then the per-item disagreement
    // folds IN-ROW over the item's cell list (bounded by its rater
    // count) — no cells⋈perItem join, one exchange fewer, and the
    // per-cell micro-rounding is identical to the joined form
    val cells = df
      .where(col(itemCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(catCol).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
    val items = cells.groupBy("item")
      .agg(collect_list(struct(col("k"), col("c"))).as("xs"),
        sum("c").as("ri"))
      .where(col("ri") >= 2)
      .select(col("item"), col("xs"), col("ri"),
        expr("""aggregate(xs, 0L, (acc, e) ->
          |  acc + CAST(round(CAST(e.c AS DOUBLE)
          |    * (CAST(ri AS DOUBLE) - CAST(e.c AS DOUBLE))
          |    / (CAST(ri AS DOUBLE) - 1.0) * 1e6) AS BIGINT))"""
          .stripMargin).as("do_i"))
      .localCheckpoint(false)
    val doSum = items.agg(coalesce(sum("do_i"), lit(0L)).as("do_micro"),
      coalesce(sum("ri"), lit(0L)).as("n"),
      count(lit(1)).as("n_items"))
    val catTot = items
      .select(explode(col("xs")).as("e"))
      .groupBy(col("e.k").as("k")).agg(sum(col("e.c").cast(dec)).as("nc"))
    val de = catTot.crossJoin(doSum.select(col("n").as("__n")))
      .agg(coalesce(sum(col("nc") * (col("__n").cast(dec) - col("nc"))),
        lit(0).cast(dec)).as("se"))
    doSum.crossJoin(de)
      .select(col("n").as("n_values"), col("n_items"),
        when(col("se").cast("double") > 0,
          round((lit(1.0) -
            (col("do_micro").cast("double") / 1e6 / col("n").cast("double"))
              / (col("se").cast("double")
                / (col("n").cast("double")
                  * (col("n").cast("double") - lit(1.0)))))
            * 1e6).cast("long")).as("alpha_micro"))
  }

  /** Lin's concordance correlation coefficient (Lin 1989, "A
    * concordance correlation coefficient to evaluate
    * reproducibility"): agreement of two CONTINUOUS measurements —
    * Pearson r penalized by scale and location shift,
    *   CCC = 2·cov(x,y) / (σx² + σy² + (x̄ − ȳ)²).
    * Closed from exact DECIMAL moments via the n²-scaled identity
    *   CCC = 2(nΣxy − ΣxΣy) / ((nΣx² − (Σx)²) + (nΣy² − (Σy)²)
    *         + (Σx − Σy)²)
    * — every term an exact integer, ONE double division. The
    * continuous companion of [[cohensKappa]] for method-comparison /
    * duplicate-measurement QA. Output: (key, n, ccc_micro — NULL
    * when the denominator is 0). */
  def linCcc(df: DataFrame, keyCol: String, xCol: String,
             yCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = col(xCol).cast("long").cast(dec)
    val y = col(yCol).cast("long").cast(dec)
    val g = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val num = lit(2.0) * (n * d("sxy") - d("sx") * d("sy"))
    val den = (n * d("sxx") - d("sx") * d("sx")) +
      (n * d("syy") - d("sy") * d("sy")) +
      (d("sx") - d("sy")) * (d("sx") - d("sy"))
    g.select(col("key"), col("n"),
      when(den > 0, round(num / den * 1e6).cast("long")).as("ccc_micro"))
  }

  /** Hellinger distance between two groups' value distributions per
    * stratum (Hellinger 1909; the bounded, symmetric drift measure
    * beside [[ksByStratum]]'s sup-gap and q247's JS divergence):
    *   H = √(1 − Σ_c √(p_c·q_c)),  BC = Σ √(p_c·q_c)
    * over the shared value cells. Per-cell √((a·b)/(A·B)) terms
    * micro-round in one fixed float order and integer-sum; H closes
    * with one √. Output: (stratum, n_a, n_b, bc_micro, h_micro). */
  def hellingerByStratum(df: DataFrame, stratumCol: String,
                         groupCol: String, groupA: String, groupB: String,
                         valueCol: String): DataFrame = {
    val cells = df
      .where(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"),
        col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("b"))
      .localCheckpoint(false)
    val sizes = cells.groupBy("stratum")
      .agg(sum("a").as("n_a"), sum("b").as("n_b"))
    def d(c: String) = col(c).cast("double")
    val joined = cells.join(sizes, Seq("stratum"))
    val bcT = round(sqrt(d("a") * d("b") / (d("n_a") * d("n_b"))) * 1e6)
      .cast("long")
    joined.groupBy("stratum")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        coalesce(sum(bcT), lit(0L)).as("bc_micro"))
      .select(col("stratum"), col("n_a"), col("n_b"), col("bc_micro"),
        round(sqrt(greatest(lit(0.0),
          lit(1.0) - col("bc_micro").cast("double") / 1e6)) * 1e6)
          .cast("long").as("h_micro"))
  }

  /** Population stability index per stratum (the standard
    * model-monitoring drift score; e.g. Siddiqi 2006, "Credit risk
    * scorecards"): PSI = Σ_c (p_c − q_c)·ln(p_c/q_c) over value
    * cells, ADD-ONE smoothed over the union of observed cells (PSI
    * is undefined on empty cells; the smoothing convention is
    * documented and replayed by the oracle — deterministic, no ε
    * tuning). Per-cell terms micro-round fixed-order and
    * integer-sum. Rule of thumb: < 0.1 stable, > 0.25 investigate.
    * Output: (stratum, n_a, n_b, n_cells, psi_micro). */
  def psiByStratum(df: DataFrame, stratumCol: String, groupCol: String,
                   groupA: String, groupB: String,
                   valueCol: String): DataFrame = {
    val cells = df
      .where(col(groupCol).isin(groupA, groupB) && col(valueCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"),
        col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("b"))
      .localCheckpoint(false)
    val sizes = cells.groupBy("stratum")
      .agg(sum("a").as("n_a"), sum("b").as("n_b"),
        count(lit(1)).as("n_cells"))
    def d(c: String) = col(c).cast("double")
    val joined = cells.join(sizes, Seq("stratum"))
    // add-one smoothing: p = (a+1)/(n_a + n_cells), q likewise
    val p = (d("a") + lit(1.0)) / (d("n_a") + d("n_cells"))
    val q = (d("b") + lit(1.0)) / (d("n_b") + d("n_cells"))
    val term = round((p - q) * log(p / q) * 1e6).cast("long")
    joined.groupBy("stratum")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        max("n_cells").as("n_cells"),
        coalesce(sum(term), lit(0L)).as("psi_micro"))
  }

  /** First-order partial correlation per key (the CONTROLLED
    * association screen — "does x still correlate with y once z is
    * held fixed?"; Fisher 1924):
    *   r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²)).
    * All three pairwise correlations close from ONE pass of exact
    * DECIMAL moments (the [[corrMatrix]] discipline) in a single
    * documented float order, so the result replays in any engine.
    * The confounder check beside [[mantelHaenszel]] (categorical) —
    * this is its continuous twin. Output: (key, n, r_xy_micro,
    * r_xy_z_micro — NULLs when any variance is 0 or a control
    * correlation is ±1). */
  def partialCorrByKey(df: DataFrame, keyCol: String, xCol: String,
                       yCol: String, zCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val x = col(xCol).cast("long").cast(dec)
    val y = col(yCol).cast("long").cast(dec)
    val z = col(zCol).cast("long").cast(dec)
    val g = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(zCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(z).as("sz"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(z * z).as("szz"),
        sum(x * y).as("sxy"), sum(x * z).as("sxz"), sum(y * z).as("syz"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    def cv(sab: String, sa: String, sb: String) =
      n * d(sab) - d(sa) * d(sb)
    def vr(saa: String, sa: String) = n * d(saa) - d(sa) * d(sa)
    val vx = vr("sxx", "sx"); val vy = vr("syy", "sy"); val vz = vr("szz", "sz")
    val rxy = cv("sxy", "sx", "sy") / sqrt(vx * vy)
    val rxz = cv("sxz", "sx", "sz") / sqrt(vx * vz)
    val ryz = cv("syz", "sy", "sz") / sqrt(vy * vz)
    val denom = sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    val ok = col("n") >= 3 && vx > 0 && vy > 0 && vz > 0
    g.select(col("key"), col("n"),
      when(ok, round(rxy * 1e6).cast("long")).as("r_xy_micro"),
      when(ok && denom > 0,
        round((rxy - rxz * ryz) / denom * 1e6).cast("long"))
        .as("r_xy_z_micro"))
  }

  /** Cronbach's α (Cronbach 1951, "Coefficient alpha and the internal
    * structure of tests"): internal-consistency reliability of k
    * items measured on the same subjects —
    *   α = k/(k−1) · (1 − Σᵢ σᵢ² / σ_T²)
    * with per-item POPULATION variances σᵢ² and the variance of
    * subject totals σ_T² (divisor convention documented; both sides
    * replay it). The annotation/eval-suite reliability score beside
    * [[fleissKappa]] (κ grades categorical agreement; α grades
    * graded-score consistency). Every subject must answer every item
    * exactly once (enforced). Exact DECIMAL moments; one float
    * close. Output: one row (n_subjects, k, alpha_micro — NULL when
    * σ_T² = 0 or k < 2). */
  def cronbachAlpha(df: DataFrame, subjectCol: String, itemCol: String,
                    valueCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rows = df.where(col(valueCol).isNotNull)
      .select(col(subjectCol).as("s"), col(itemCol).cast("string").as("i"),
        col(valueCol).cast("long").as("v"))
      .localCheckpoint(false)
    val shape = rows.groupBy("s")
      .agg(count(lit(1)).as("nr"), count_distinct(col("i")).as("ni"))
      .agg(min("nr"), max("nr"), min("ni"), count(lit(1))).head()
    require(shape.getLong(0) == shape.getLong(1) &&
      shape.getLong(0) == shape.getLong(2),
      s"cronbachAlpha: every subject must answer every item once " +
        s"(row counts ${shape.getLong(0)}..${shape.getLong(1)}, " +
        s"distinct items ${shape.getLong(2)})")
    val k = shape.getLong(0)
    val nSub = shape.getLong(3)
    require(k >= 2, s"cronbachAlpha: need k >= 2 items, got $k")
    // Per-subject counts alone admit DISJOINT k-item sets (two
    // subjects each answering k different items pass the check above
    // yet make the per-item variance term use the wrong n) — also pin
    // the GLOBAL item universe to exactly k items, each answered by
    // every subject (round-9 advice).
    val itemShape = rows.groupBy("i").agg(count(lit(1)).as("nresp"))
      .agg(count(lit(1)), min("nresp"), max("nresp")).head()
    require(itemShape.getLong(0) == k,
      s"cronbachAlpha: subjects answer DIFFERENT item sets " +
        s"(global distinct items ${itemShape.getLong(0)}, per-subject $k)")
    require(itemShape.getLong(1) == nSub && itemShape.getLong(2) == nSub,
      s"cronbachAlpha: every item must be answered by every subject " +
        s"(item response counts ${itemShape.getLong(1)}.." +
        s"${itemShape.getLong(2)}, subjects $nSub)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    // Σᵢ n·σᵢ²·n = Σᵢ (n·Σv² − (Σv)²) — exact integers
    val items = rows.groupBy("i")
      .agg(sum(col("v").cast(dec)).as("sv"),
        sum(col("v").cast(dec) * col("v").cast(dec)).as("svv"))
      .agg(coalesce(sum(lit(nSub).cast(dec) * col("svv")
        - col("sv") * col("sv")), lit(0).cast(dec)).as("si"))
    val totals = rows.groupBy("s").agg(sum(col("v").cast(dec)).as("t"))
      .agg(sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"))
      .select((lit(nSub).cast(dec) * col("stt")
        - col("st") * col("st")).as("vt"))
    items.crossJoin(totals)
      .select(lit(nSub).as("n_subjects"), lit(k).as("k"),
        when(d(col("vt")) > 0,
          round(lit(k.toDouble) / lit((k - 1).toDouble)
            * (lit(1.0) - d(col("si")) / d(col("vt"))) * 1e6)
            .cast("long")).as("alpha_micro"))
  }

  /** Mantel–Haenszel pooled odds ratio (Mantel & Haenszel 1959)
    * across stratified 2×2 tables — "does the exposure/outcome
    * association survive controlling for the stratifier?", the
    * confounding screen run before trusting any marginal odds ratio
    * (Simpson's-paradox guard). Per stratum (a, b, c, d) counts are
    * exact integers; the per-stratum terms a·d/n and b·c/n are
    * micro-rounded in one fixed float order and integer-summed
    * ([[ljungBox]] discipline); OR_MH = R/S closes in one division.
    * Output: one row (n_strata, r_micro, s_micro, or_micro — NULL
    * when S = 0). */
  def mantelHaenszel(df: DataFrame, stratumCol: String,
                     exposureCol: String, outcomeCol: String): DataFrame = {
    val rows = df
      .where(col(exposureCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(stratumCol).as("st"),
        col(exposureCol).cast("boolean").as("x"),
        col(outcomeCol).cast("boolean").as("y"))
    val cells = rows.groupBy("st").agg(
      sum(when(col("x") && col("y"), 1L).otherwise(0L)).as("a"),
      sum(when(col("x") && !col("y"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("x") && col("y"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("x") && !col("y"), 1L).otherwise(0L)).as("d"))
    def d2(c: String) = col(c).cast("double")
    val n = d2("a") + d2("b") + d2("c") + d2("d")
    val terms = cells.select(
      round(d2("a") * d2("d") / n * 1e6).cast("long").as("rm"),
      round(d2("b") * d2("c") / n * 1e6).cast("long").as("sm"))
    terms.agg(count(lit(1)).as("n_strata"),
        coalesce(sum("rm"), lit(0L)).as("r_micro"),
        coalesce(sum("sm"), lit(0L)).as("s_micro"))
      .select(col("n_strata"), col("r_micro"), col("s_micro"),
        when(col("s_micro") > 0,
          round(col("r_micro").cast("double")
            / col("s_micro").cast("double") * 1e6).cast("long"))
          .as("or_micro"))
  }
}
