package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus shaping operators for training-data curation. */
object Sampling {

  /** Weighted sampling WITHOUT replacement, exactly `k` rows,
    * deterministic (Efraimidis & Spirakis 2006 via the exponential
    * formulation: priority = -ln(u)/w with u uniform per item — the
    * k smallest priorities are a w-weighted sample; "sample by
    * quality score" as a primitive). u is derived from a seeded hash
    * of the id — no RNG, rerunnable, and DuckDB-replayable: u = (h
    * mod p + 1)/(p + 1) is an exact rational of the shared md5 hash,
    * the priority follows a fixed operation order, and the k-cut is
    * by (rounded priority, id) — total order, no flap. The plan is
    * one scan + a bounded TakeOrdered (per-partition truncation at
    * k); nothing shuffles but k-row partials. Non-positive weights
    * are excluded (they have no sampling mass). Output: input columns
    * + priority_micro, ordered by the draw. */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = graft.functions.Hashes.md5Hash64(
      concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val u = (pmod(h, lit(1000000007L)).cast("double") + lit(1.0)) /
      lit(1000000008.0)
    val pr = round(lit(1e6) *
      (-log(u) / col(weightCol).cast("double"))).cast("long")
    df.where(col(weightCol) > 0)
      .withColumn("priority_micro", pr)
      .orderBy(col("priority_micro").asc, col(idCol).asc)
      .limit(k)
  }

  /** [[sampleWeighted]] per key: at most `k` rows PER value of
    * `keyCol`, drawn by weight within each key ("k docs per domain by
    * quality" — the per-stratum form of the ES draw; same priority
    * math, but the cut is a row_number window partitioned by key, so
    * the shuffle is one key-partitioned exchange and each window
    * group is that key's rows, never the corpus). */
  def sampleWeightedPerKey(df: DataFrame, keyCol: String, idCol: String,
                           weightCol: String, k: Int,
                           seed: Long = 42L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = graft.functions.Hashes.md5Hash64(
      concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val u = (pmod(h, lit(1000000007L)).cast("double") + lit(1.0)) /
      lit(1000000008.0)
    val pr = round(lit(1e6) *
      (-log(u) / col(weightCol).cast("double"))).cast("long")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("priority_micro").asc, col(idCol).asc)
    df.where(col(weightCol) > 0)
      .withColumn("priority_micro", pr)
      .withColumn("draw_rank", row_number().over(w).cast("long"))
      .where(col("draw_rank") <= k)
  }

  /** Deterministic stratified head: at most `n` rows per stratum,
    * picked by ascending `orderCol` (use a hash column for an unbiased
    * draw, an id for reproducible slices). One shuffle on the stratum
    * key; rank is a running window inside each stratum partition. */
  def stratifiedHead(df: DataFrame, stratumCol: String, orderCol: String,
                     n: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(stratumCol).orderBy(col(orderCol))))
      .where(col("__rn") <= n)
      .drop("__rn")

  /** Two-phase salted aggregation for skewed keys: counts and sums per
    * key computed as salt-local partials then re-reduced, so one hot
    * key spreads over `salts` reducers instead of melting one. Result
    * is identical to a direct groupBy — this is purely a physical
    * reshaping. */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String,
                salts: Int = 16): DataFrame = {
    // Salt from a row-level source, not the value: a hot key with
    // identical/low-cardinality values (or NULLs) would otherwise map to
    // one salt and still melt a single reducer. The salt never appears in
    // the result, so any per-row assignment preserves exactness.
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partial = salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, 4))).as("__s"))
    partial
      .groupBy(col(keyCol))
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("sum_value"))
  }

  /** Concat-and-chunk sequence packing: the standard LLM pre-training
    * layout — documents are (logically) concatenated in `idCol` order
    * and the token stream is cut every `seqLen` tokens, documents
    * straddling cut points. Emits, per document, its exclusive global
    * token offset and the [start_chunk, end_chunk] span of training
    * sequences it lands in (NULL span for zero-token docs, which
    * occupy no stream position).
    *
    * The global running sum is a DISTRIBUTED two-phase prefix sum —
    * the naive `Window.orderBy(id)` with no partition key would drag
    * the whole corpus through ONE task. Ids are bucketed by VALUE
    * RANGE (width from the id bounds — order-preserving, so bucket i's
    * ids all precede bucket i+1's): phase 1 aggregates per-bucket
    * token subtotals (keys-only, map-side combined); phase 2 turns
    * them into exclusive bucket offsets with a window over that
    * metadata-scale frame; phase 3 adds the broadcast offset to a
    * within-bucket running sum. ONE corpus-scale shuffle (the
    * within-bucket window, on a 3-column projection — the operator
    * never sees document text), and the result is independent of the
    * bucket boundaries, so it replays engine-exactly against a
    * single-window oracle. Balance follows the id distribution: dense
    * ids (the usual corpus layout) spread evenly; tune `parts` for
    * pathological sparsity. */
  def packChunks(df: DataFrame, idCol: String, nTokCol: String,
                 seqLen: Int, parts: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val p = if (parts > 0) parts
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val narrow = df.select(col(idCol).cast("long").as("id"),
      col(nTokCol).cast("long").as("n_tokens"))
    val bounds = narrow.agg(min("id"), max("id")).head()
    if (bounds.isNullAt(0))
      return narrow.select(col("id"), col("n_tokens"),
        lit(null).cast("long").as("offset"),
        lit(null).cast("long").as("start_chunk"),
        lit(null).cast("long").as("end_chunk"))
    val lo = bounds.getLong(0)
    val width = math.max(1L, (bounds.getLong(1) - lo) / p + 1)
    val bucketed = narrow.withColumn("__b", expr(s"(id - $lo) DIV $width"))
    val offsets = bucketed.groupBy("__b")
      .agg(sum("n_tokens").as("__bsum"))
      .withColumn("__boff",
        coalesce(sum("__bsum").over(
          Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__b", "__boff")
    val local = Window.partitionBy("__b").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("offset", col("__boff") + coalesce(sum("n_tokens").over(local), lit(0L)))
      .withColumn("start_chunk",
        when(col("n_tokens") > 0, expr(s"offset DIV $seqLen")))
      .withColumn("end_chunk",
        when(col("n_tokens") > 0, expr(s"(offset + n_tokens - 1) DIV $seqLen")))
      .select(col("id"), col("n_tokens"), col("offset"),
        col("start_chunk"), col("end_chunk"))
  }

  /** The materialization plan for [[packChunks]]: one row per
    * (chunk, doc) SLICE — which token range of each document lands in
    * which training sequence. `doc_from` is the 0-based token start
    * within the doc, `slice_len` its length; a writer groups by
    * `chunk_id` and concatenates slices in id order to emit packed
    * sequences (every chunk sums to exactly `seqLen` tokens except
    * the ragged last). Pure integer arithmetic on top of the
    * distributed prefix sum — the explode multiplies rows only by
    * each doc's chunk-span (|span| ≤ n_tokens/seqLen + 2). */
  def packSlices(df: DataFrame, idCol: String, nTokCol: String,
                 seqLen: Int, parts: Int = 0): DataFrame = {
    val l = lit(seqLen.toLong)
    packChunks(df, idCol, nTokCol, seqLen, parts)
      .where(col("n_tokens") > 0)
      .select(col("id"), col("n_tokens"), col("offset"),
        explode(sequence(col("start_chunk"), col("end_chunk"))).as("chunk_id"))
      .select(col("chunk_id"), col("id"),
        (greatest(col("offset"), col("chunk_id") * l) - col("offset"))
          .as("doc_from"),
        (least(col("offset") + col("n_tokens"), (col("chunk_id") + 1) * l)
          - greatest(col("offset"), col("chunk_id") * l)).as("slice_len"))
  }

  /** True packed-sequence OUTPUT: [[packSlices]] joined back to the
    * tokenized text, each (chunk, doc) slice cut with `slice()`, and
    * each chunk's pieces concatenated in id order — (chunk_id,
    * tokens), every row exactly `seqLen` tokens except the ragged
    * last. The per-chunk collect is bounded by seqLen (one training
    * sequence per row), the slice join is co-keyed on id — nothing
    * here holds more than one chunk's tokens at a time, so the path
    * writes packed pre-training data straight to parquet at corpus
    * scale. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, parts: Int = 0): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("id"),
      graft.functions.Text.tokens(col(textCol)).as("tk"))
    val counts = toks.select(col("id"), size(col("tk")).cast("long").as("n_tokens"))
    val slices = packSlices(counts, "id", "n_tokens", seqLen, parts)
    slices.join(toks, Seq("id"))
      .select(col("chunk_id"), col("id"),
        slice(col("tk"), (col("doc_from") + 1).cast("int"),
          col("slice_len").cast("int")).as("piece"))
      .groupBy("chunk_id")
      .agg(array_sort(collect_list(struct(col("id"), col("piece")))).as("ps"))
      .select(col("chunk_id"),
        flatten(transform(col("ps"), p => p.getField("piece"))).as("tokens"))
  }

  /** Training-mixture manifest: per-source document and token counts
    * with token share — the dataset-card report for a curated corpus
    * (and the input to rebalancing decisions via
    * [[weightedMixture]]). One keys-only aggregate; the share divides
    * by the window-summed total (sources are few, the window frame is
    * metadata-scale). */
  def mixtureManifest(df: DataFrame, sourceCol: String,
                      nTokCol: String): DataFrame = {
    val agg = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nTokCol).cast("long")).as("n_tokens"))
    agg.select(col("source"), col("n_docs"), col("n_tokens"),
      round(col("n_tokens").cast("double") /
        sum("n_tokens").over(Window.partitionBy()), 6).as("token_share"))
  }

  /** Temperature-scaled source weights — the multilingual/multi-source
    * sampling standard (mBERT/XLM-R's exponentiated smoothing): each
    * source's sampling mass is n_s^alpha renormalized, with alpha < 1
    * UPweighting small sources (alpha=1 is proportional, alpha=0
    * uniform). Output per source: (source, n_docs, weight_micro,
    * rate_micro) where weight is the normalized mass and rate =
    * min(1, budgetDocs * weight / n_s) is the per-source Bernoulli
    * rate that spends `budgetDocs` across the corpus — feed it to
    * [[weightedMixture]] (or [[upsampleMixture]] when small sources
    * should repeat, rate > 1 capped here).
    *
    * One count shuffle; everything after is metadata-scale (one row
    * per source). Bit-stability: alpha=0.5 routes through sqrt (IEEE
    * exactly-rounded in BOTH engines, unlike pow's 1-ulp license),
    * the normalizing sum is an ORDERED fold over the source-sorted
    * list, and micro-unit outputs go through floor (double→long CAST
    * truncates in Spark but rounds in DuckDB — floor is the one
    * shared quantizer). Non-0.5 alphas work but their gate-exactness
    * is not guaranteed cross-engine. */
  def temperatureWeights(df: DataFrame, sourceCol: String,
                         budgetDocs: Long, alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0, "alpha must be non-negative")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val scaled = counts.withColumn("s",
      if (alpha == 0.5) sqrt(col("n_docs").cast("double"))
      else pow(col("n_docs").cast("double"), lit(alpha)))
    val total = scaled.agg(
      aggregate(array_sort(collect_list(struct(col("source"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("t"))
    val w = col("s") / col("t")
    scaled.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"),
        floor(w * 1000000.0).cast("long").as("weight_micro"),
        floor(least(lit(1.0),
          lit(budgetDocs.toDouble) * w / col("n_docs").cast("double"))
          * 1000000.0).cast("long").as("rate_micro"))
  }

  /** Robust (median / MAD) score scaling in exact integer micro-units
    * — the outlier-proof normalizer of the score-calibration family:
    * [[rankNormalize]] destroys the score's shape (uniform ranks),
    * z-scores let one viral page drag the mean; median/MAD moves for
    * neither. `robust_micro = ((v·1e6 − med_micro)·1e6) div
    * max(1, mad_micro)` — so 1_000_000 means "one MAD above the
    * median" (multiply by 0.6745 for a σ-consistent z under
    * normality).
    *
    * `valueCol` must be integer-valued (token/char counts, micro-unit
    * scores — every quality signal in this repo) with |v| ≲ 9e9:
    * medians of integers land on .0/.5 and MAD inputs on .25 steps,
    * all exact in doubles and re-scaled to exact longs, which is what
    * makes the output decimal-replayable across engines (the q63
    * micro-unit discipline applied to location/scale statistics).
    *
    * Plan shape: two driver-collected scalar aggregates (exact
    * `percentile` here; swap Greenwald-Khanna `approx_percentile` at
    * 100 TB — the [[quantilesApprox]] posture, then med/mad become
    * rank-bounded approximations) inlined as plan literals + ONE
    * scan-shaped projection; the corpus never shuffles. */
  def robustScale(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val v = s"CAST($valueCol AS BIGINT)"
    val medRow = df.agg(expr(s"percentile($v, 0.5d)")).head()
    require(!medRow.isNullAt(0), "robustScale needs at least one non-null value")
    val medMicro = math.rint(medRow.getDouble(0) * 1e6).toLong
    val madMicro = math.rint(
      df.agg(expr(s"percentile(abs($v * 1000000L - ${medMicro}L), 0.5d)"))
        .head().getDouble(0)).toLong
    df.select(col(idCol), col(valueCol),
      expr(s"(($v * 1000000L - ${medMicro}L) * 1000000L) div " +
        s"greatest(1L, ${madMicro}L)").as("robust_micro"))
  }

  /** Exact global percentile rank WITHOUT a single-partition window —
    * the normalization step for quality-signal ensembles (rank-blend
    * heterogeneous scores before averaging/thresholding, curriculum
    * position, calibration plots). `Window.orderBy(score)` alone
    * funnels the corpus through ONE task; this is its scalable twin,
    * the q117/packChunks two-phase shape: approx-quantile range
    * buckets (boundary QUALITY only affects balance, never the
    * result — bucketing-invariance is spec'd at 1/7/64 buckets),
    * per-bucket counts collected (metadata-scale) into plan-literal
    * prefix offsets, then a per-BUCKET window; rank = bucket offset +
    * local row_number. All parallelism is across buckets, which scale
    * with the cluster.
    *
    * Rank is row_number semantics by (score ASC, id ASC): ties take
    * distinct consecutive ranks deterministically (not SQL
    * percent_rank's shared ranks — document choice, spec'd). NULL
    * scores sort first (worst, pct ~0 — the sampleTokenBudgetBest
    * -inf convention). Output: (id, score key, rank 1-based,
    * pct_micro = (rank-1)*1e6 div (n-1); 0 when n = 1).
    *
    * Skew posture: score-percentile boundaries cannot split ties, so
    * a bucket whose mass concentrates on one value (>4×/p of the
    * corpus) gets a SECOND-level split by composite (score, id)
    * boundary pairs sampled content-hash-deterministically from the
    * bucket — lexicographic cuts preserve the (score, id) total
    * order, so ranks stay exact for any boundary choice and the hot
    * value's rows spread over ~its-share×buckets tasks (spec'd on a
    * 90%-one-value corpus). */
  def rankNormalize(df: DataFrame, idCol: String, scoreCol: String,
                    buckets: Int = 0): DataFrame = {
    val p = math.max(1, if (buckets > 0) buckets
                         else df.sparkSession.sessionState.conf.numShufflePartitions)
    val scoreKey = coalesce(col(scoreCol).cast("double"),
      lit(Double.NegativeInfinity))
    val withB =
      if (p == 1) df.withColumn("__b", lit(0))
      else {
        val bnds = df.agg(percentile_approx(scoreKey,
          typedlit((1 until p).map(_.toDouble / p)), lit(10000)).as("__bnds"))
        df.crossJoin(broadcast(bnds))
          // bucket = boundaries strictly BELOW the score: equal scores
          // always share a bucket, so the in-bucket id tiebreak is total
          .withColumn("__b", size(filter(col("__bnds"), b => b < scoreKey)))
          .drop("__bnds")
      }
    // bucket counts are metadata-scale (<= buckets rows): collect them
    // and ride the offsets as a plan-literal CASE instead of two
    // single-partition windows + a broadcast join — 4 fewer exchanges
    // per signal (the blendRanks exchange-budget gate caught the fat
    // form). Exact-rank inherently needs the extra counting pass.
    val countRows = withB.groupBy("__b").agg(count(lit(1)).as("__bn"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = countRows.map(_._2).sum
    // HEAVY buckets (score ties concentrate mass — percentile
    // boundaries cannot split ties) get a second-level split by
    // composite (score, id) boundary PAIRS sampled content-hash-
    // deterministically from inside the bucket. Lexicographic cuts
    // preserve the (score ASC, id ASC) order across sub-buckets, so
    // ranks stay exact for ANY boundary choice — same invariance
    // argument as the score boundaries themselves.
    val heavy = countRows.filter { case (_, bn) =>
      p > 1 && bn > 1 && bn * p > 4L * n }
    val subBnds: Map[Int, Seq[(Double, Any)]] = heavy.map { case (b, bn) =>
      val subP = math.min(p, math.ceil(bn.toDouble * p / n).toInt)
      val target = subP * 32L
      val mod = math.max(1L, bn / target)
      def idLt(a: Any, c: Any): Boolean = (a, c) match {
        case (x: Long, y: Long) => x < y
        case (x: Int, y: Int) => x < y
        case (x: Double, y: Double) => x < y
        case (x: String, y: String) => x < y
        case (x, y) => x.toString < y.toString
      }
      val sample = withB.where(col("__b") === b)
        .where(pmod(graft.functions.Hashes.md5Hash64(col(idCol)), lit(mod)) === 0L)
        .select(scoreKey.as("__s"), col(idCol))
        .limit(100000)
        .collect().map(r => (r.getDouble(0), r.get(1)))
        .sortWith { case ((s1, i1), (s2, i2)) =>
          s1 < s2 || (s1 == s2 && idLt(i1, i2)) }
      val step = math.max(1, sample.length / subP)
      b -> sample.grouped(step).map(_.head).drop(1).toSeq
    }.toMap
    val subExpr = subBnds.foldLeft(lit(0)) { case (acc, (b, bnds)) =>
      if (bnds.isEmpty) acc
      else {
        val cnt = bnds.map { case (bs, bi) =>
          when(scoreKey > bs ||
            (scoreKey === bs && col(idCol) > lit(bi)), 1).otherwise(0)
        }.reduce(_ + _)
        when(col("__b") === b, cnt).otherwise(acc)
      }
    }
    val withSb = withB.withColumn("__sb", subExpr)
    // final counts per (bucket, sub-bucket): metadata-scale again
    val fine = withSb.groupBy("__b", "__sb")
      .agg(count(lit(1)).as("__bn"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .sortBy(_._1)
    val offsets = fine.map(_._1)
      .zip(fine.scanLeft(0L)(_ + _._2).dropRight(1))
    val offExpr = offsets.foldLeft(lit(0L)) { case (acc, ((b, sb), off)) =>
      when(col("__b") === b && col("__sb") === sb, lit(off)).otherwise(acc)
    }
    val local = Window.partitionBy("__b", "__sb")
      .orderBy(scoreKey.asc, col(idCol).asc)
    withSb
      .withColumn("rank", offExpr + row_number().over(local).cast("long"))
      .withColumn("pct_micro",
        if (n <= 1L) lit(0L)
        else expr(s"((rank - 1) * 1000000) div ${n - 1}L"))
      .select(col(idCol), scoreKey.as("score_key"), col("rank"), col("pct_micro"))
  }

  /** Quantile normalization onto a REFERENCE group (the microarray /
    * batch-effect recipe — Bolstad et al. 2003, "A comparison of
    * normalization methods", Bioinformatics; public): every group's
    * value distribution is mapped onto the reference group's, rank
    * for rank — row with rank i of n_g in its group takes the
    * reference value at position ⌈i·n_ref/n_g⌉. Kills scale/shift/
    * shape differences between batches while preserving each group's
    * internal ordering; all-integer (ranks + a ceiling division), so
    * engine-exact by construction.
    *
    * Scale shape: per-group ranks ride a (group)-partitioned window
    * — the standard per-batch sort; the reference column is ONE
    * group's (pos, value) table, joined back by the computed
    * position (n_ref-bounded build side). Ties break by id, so the
    * map is total and deterministic. Output: (id, grp, v, v_norm).
    */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
                        valueCol: String, refGroup: String): DataFrame = {
    val rows = df
      .where(col(valueCol).isNotNull)
      .select(col(idCol).as("id"), col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
    val wg = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val ranked = rows.withColumn("rk", row_number().over(wg).cast("long"))
    val sizes = ranked.groupBy("g").agg(count(lit(1)).as("ng"))
    val ref = ranked.where(col("g") === refGroup)
      .select(col("rk").as("pos"), col("v").as("v_ref"))
    val nRef = ref.count()
    require(nRef >= 1, s"quantileNormalize: reference group '$refGroup' is empty")
    ranked.join(broadcast(sizes), Seq("g"))
      // pos = ceil(rk * nRef / ng) via (a + b - 1) div b (portable:
      // non-negative operands)
      .withColumn("pos",
        expr(s"(rk * ${nRef}L + ng - 1L) div ng"))
      .join(ref, Seq("pos"))
      .select(col("id"), col("g").as("grp"), col("v"),
        col("v_ref").as("v_norm"))
  }

  /** Rank-blend ensemble: heterogeneous quality signals (classifier
    * scores, PageRank, token entropy, …) are incomparable in raw
    * units — normalize each to its exact global percentile
    * ([[rankNormalize]]) and take the weighted mean. The standard way
    * curation stacks combine filters without per-signal threshold
    * tuning. One rankNormalize pass per signal (bucket-parallel, see
    * there) plus |signals|−1 id-keyed joins; output (id,
    * pct_<signal>… , blend_micro). blend_micro =
    * floor(Σ wᵢ·pctᵢ / Σw) evaluated in declaration order — the
    * oracle replays the identical fold, so render weights from the
    * same literals. */
  def blendRanks(df: DataFrame, idCol: String,
                 weights: Seq[(String, Double)],
                 buckets: Int = 0): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "need at least one signal with positive weight")
    val totalW = weights.map(_._2).sum
    val ranked = weights.map { case (c, _) =>
      rankNormalize(df.select(col(idCol), col(c)), idCol, c, buckets)
        .select(col(idCol), col("pct_micro").as(s"pct_$c"))
    }.reduce(_.join(_, Seq(idCol)))
    val blend = weights.map { case (c, w) => col(s"pct_$c") * lit(w) }
      .reduce(_ + _)
    ranked.withColumn("blend_micro",
      floor(blend / lit(totalW)).cast("long"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09 — public
    * method): combine heterogeneous retrieval/quality signals by
    * DESCENDING rank alone, rrf = Σᵢ 1/(k + rankᵢ). The standard
    * no-tuning ensemble when signal SCALES are incomparable but
    * orderings are trustworthy; `k` (default 60) damps the head.
    *
    * Ranks are exact descending row_number ranks — (score DESC,
    * id ASC) tie-break — computed by [[rankNormalize]] over the
    * NEGATED score (null score → +∞ after negation, i.e. ranked
    * worst), so the bucket-parallel two-phase rank machinery (no
    * single-partition window, heavy-tie sub-splits) is reused as-is.
    * rrf_micro = Σ ⌊1e6/(k + rank)⌋ — each term an integer division,
    * the sum exact: engine-portable without float-order caveats.
    *
    * Output: (id, rank_<signal>…, rrf_micro). One rankNormalize pass
    * per signal plus |signals|−1 id-keyed joins ([[blendRanks]]'s
    * exchange budget). */
  def rrfFuse(df: DataFrame, idCol: String, signals: Seq[String],
              k: Int = 60, buckets: Int = 0): DataFrame = {
    require(signals.nonEmpty, "need at least one signal")
    require(k >= 0, s"k must be >= 0, got $k")
    val ranked = signals.map { c =>
      val neg = df.select(col(idCol),
        coalesce(-col(c).cast("double"), lit(Double.PositiveInfinity))
          .as(s"__neg_$c"))
      rankNormalize(neg, idCol, s"__neg_$c", buckets)
        .select(col(idCol), col("rank").as(s"rank_$c"))
    }.reduce(_.join(_, Seq(idCol)))
    val rrf = signals.map { c =>
      expr(s"1000000L div (${k}L + rank_$c)")
    }.reduce(_ + _)
    ranked.withColumn("rrf_micro", rrf.cast("long"))
  }

  /** Quantile normalization across keys: replace each row's value by
    * the GLOBAL value at the row's within-key percentile, so every
    * key's distribution maps onto the pooled one (the cross-source
    * length/score harmonization trick, microarray-normalization
    * lineage). Exact integer semantics end to end: within-key rank r
    * of n_k (row_number by (x, id) — total order), target global
    * rank ⌈r·N/n_k⌉ in pure long arithmetic, and the global order
    * statistic looked up by an equi-join on an exact zipWithIndex
    * rank over the range-partitioned sort ([[Dedup
    * .sortedNeighborhoodPairs]]'s total-order discipline — one extra
    * count job, no single-partition window for the GLOBAL side).
    *
    * The within-key rank is a per-key window: parallel across keys,
    * with the usual hot-key straggler caveat (a dominant key
    * serializes its own rows; the two-phase [[rankNormalize]]
    * machinery is the upgrade path if a single key can exceed a
    * task). Output: (key, id, x, r, n_k, x_norm), non-null x only. */
  def quantileNormalizeByKey(df: DataFrame, keyCol: String, valueCol: String,
                             idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).as("key"), col(idCol).cast("long").as("id"),
        col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rows.count() // the one driver scalar (also materializes the cache)
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val wk = Window.partitionBy("key").orderBy(col("x").asc, col("id").asc)
    val r = rows
      .withColumn("r", row_number().over(wk).cast("long"))
      .withColumn("n_k", count(lit(1)).over(Window.partitionBy("key")))
      .withColumn("target", expr(s"(r * ${n}L + n_k - 1L) div n_k"))
    val gidx = rows.select(col("x"), col("id"))
      .repartitionByRange(p, col("x").asc, col("id").asc)
      .sortWithinPartitions("x", "id")
      .as[(Long, Long)].rdd.zipWithIndex()
      .map { case ((x, _), pos) => (pos + 1, x) }
      .toDF("gpos", "gx")
    // rows stays persisted — both the window side and the global index
    // read it, and the result is row-scale (persisting IT would double
    // the footprint). Query-boundary Blocks.releaseAll reclaims it.
    r.join(gidx, col("target") === col("gpos"))
      .select(col("key"), col("id"), col("x"), col("r"), col("n_k"),
        col("gx").as("x_norm"))
  }

  /** Latest-version-per-key WITHOUT a window: `max(struct(ts, tie,
    * payload...))` aggregates lexicographically, so the partial
    * (map-side) aggregate keeps ONE row per key per partition and the
    * shuffle moves one row per (key, partition) — a window
    * formulation would exchange every version of every key. (ts,
    * tie) must be unique per key (tie an id), which also makes the
    * pick deterministic; payload fields are never compared. The
    * dedup-by-recency pass every snapshot/CDC corpus needs. */
  def keepLatest(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String): DataFrame = {
    val payload = df.columns.filterNot(c =>
      c == keyCol || c == tsCol || c == tieCol).toSeq
    val packed = struct((Seq(tsCol, tieCol) ++ payload).map(col): _*)
    df.groupBy(col(keyCol)).agg(max(packed).as("__latest"))
      .select(col(keyCol) +:
        (Seq(tsCol, tieCol) ++ payload).map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Deterministic exact-size uniform sample: the n smallest id
    * hashes. Plans as TakeOrderedAndProject (per-partition bounded
    * heaps merged on the driver — no sort shuffle), is reproducible
    * across runs and engines, and a doc's membership is stable under
    * corpus growth only of larger hashes — the sampling twin of the
    * bottom-k centroid pick. `portableHash` = md5 gate mode. */
  def sampleExact(df: DataFrame, idCol: String, n: Int,
                  portableHash: Boolean = false): DataFrame = {
    val h =
      if (portableHash) graft.functions.Hashes.md5Hash64(col(idCol))
      else xxhash64(col(idCol))
    df.withColumn("__h", h).orderBy("__h").limit(n).drop("__h")
  }

  /** Deterministic exactly-k sample PER KEY — [[sampleExact]]'s
    * grouped twin (balanced per-source subsets, eval-slice carving):
    * the k smallest id-hashes within each key, computed with the
    * bounded TopK aggregator on the NEGATED hash, so map-side partial
    * heaps ship ≤ partitions·keys·k rows into the shuffle — the
    * window/QUALIFY formulation (which the oracle replays, ordering
    * by the same double) would shuffle the whole corpus. Hash ties
    * break by id; negation is IEEE-exact, so desc(-h) ≡ asc(h).
    * `portableHash` = md5 gate mode. Output: (key, id). */
  def samplePerKey(df: DataFrame, keyCol: String, idCol: String, k: Int,
                   portableHash: Boolean = false): DataFrame = {
    val h =
      if (portableHash) graft.functions.Hashes.md5Hash64(col(idCol))
      else xxhash64(col(idCol))
    val topk = TopKAggregator.udaf(k)
    df.select(col(keyCol).as("key"), col(idCol).cast("long").as("id"),
        negate(h.cast("double")).as("s"))
      .groupBy("key")
      .agg(topk(col("id"), col("s")).as("top"))
      .select(col("key").as(keyCol), explode(col("top")).as("s"))
      .select(col(keyCol), col("s._2").as(idCol))
  }

  /** EXACT stratified split — train/val/test with exact per-stratum
    * counts (floor(cumFrac·n_s) boundaries), not the hash-Bernoulli
    * approximation of [[splitById]] whose split sizes wobble ±√n.
    * Eval-set construction wants "exactly 10% of every source", and
    * at 100 TB the wobble of a 0.1% eval split is millions of docs.
    *
    * Rows order within their stratum by (md5-hash, id) — deterministic,
    * content-keyed, unbiased — and the split is a rank range. Ranking
    * uses the rankNormalize two-phase shape with one improvement: the
    * hash is UNIFORM on [0, 2^60), so range buckets are fixed-width
    * slices (h div width) and need no quantile pass at all; counts
    * per (stratum, bucket) collect (metadata-scale) into plan-literal
    * offsets and the data pays ONE (stratum, bucket) exchange. Hot
    * strata spread across all `buckets` sub-ranges — skew-proof by
    * construction. Output: (id, stratum, split). */
  def splitStratified(df: DataFrame, idCol: String, stratumCol: String,
                      fractions: Seq[(String, Double)],
                      buckets: Int = 0): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must be positive and sum to 1")
    val p = math.max(1, if (buckets > 0) buckets
                         else df.sparkSession.sessionState.conf.numShufflePartitions)
    val width = math.max(1L, (1L << 60) / p)
    val h = graft.functions.Hashes.md5Hash64(col(idCol))
    val withB = df.select(col(idCol), col(stratumCol).as("__st"), h.as("__h"))
      .withColumn("__b", expr(s"__h div ${width}L").cast("int"))
    val countRows = withB.groupBy("__st", "__b")
      .agg(count(lit(1)).as("__bn"))
      .collect().map(r => (r.get(0), r.getInt(1), r.getLong(2)))
    val byStratum = countRows.groupBy(_._1)
    // per-stratum: bucket offsets and cumulative split boundaries
    val offExpr = byStratum.foldLeft(lit(0L)) { case (acc, (st, rows)) =>
      val sorted = rows.sortBy(_._2)
      val offs = sorted.map(_._2).zip(sorted.scanLeft(0L)(_ + _._3).dropRight(1))
      val inner = offs.foldLeft(lit(0L)) { case (a, (b, off)) =>
        when(col("__b") === b, lit(off)).otherwise(a)
      }
      when(col("__st") === st, inner).otherwise(acc)
    }
    val splitExpr = byStratum.foldLeft(lit(fractions.last._1)) {
      case (acc, (st, rows)) =>
        val ns = rows.map(_._3).sum
        val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
          .map(cf => math.floor(cf * ns).toLong)
        val inner = fractions.map(_._1).zip(cuts).init
          .foldRight(lit(fractions.last._1): org.apache.spark.sql.Column) {
            case ((label, cut), rest) =>
              when(col("rank") <= cut, lit(label)).otherwise(rest)
          }
        when(col("__st") === st, inner).otherwise(acc)
    }
    val local = Window.partitionBy("__st", "__b")
      .orderBy(col("__h").asc, col(idCol).asc)
    withB
      .withColumn("rank", offExpr + row_number().over(local).cast("long"))
      .withColumn("split", splitExpr)
      .select(col(idCol), col("__st").as(stratumCol), col("split"))
  }

  /** Curriculum staging: band the corpus into `stages` difficulty
    * levels by VALUE-based quantile boundaries of `scoreCol` (stage =
    * number of boundaries at or below the score, 0-based) — the
    * easy-to-hard data-ordering step of curriculum training. Value-
    * based banding (not ntile ranks) makes the assignment a pure
    * scan-side CASE once the boundaries exist: boundaries are ONE tiny
    * aggregate (exact `percentile` for gate/dimension scale,
    * Greenwald-Khanna `approx_percentile` for 100 TB — the
    * quantilesApprox posture) collected to the driver and inlined as
    * literals, so the corpus itself never shuffles. Ties share a
    * stage, so stage populations can be uneven on tie-heavy scores —
    * the price of an engine-replayable, rank-free definition. */
  def curriculumStages(df: DataFrame, scoreCol: String, stages: Int,
                       exact: Boolean = false,
                       accuracy: Int = 10000): DataFrame = {
    require(stages >= 2, "need at least 2 stages")
    val qs = (1 until stages).map(_.toDouble / stages)
    val sc = col(scoreCol).cast("double")
    val boundsRow =
      if (exact) df.agg(percentile(sc, array(qs.map(lit(_)): _*)).as("b")).head()
      else df.agg(approx_percentile(sc, array(qs.map(lit(_)): _*),
        lit(accuracy)).as("b")).head()
    if (boundsRow.isNullAt(0)) df.withColumn("stage", lit(0))
    else {
      val stage = boundsRow.getSeq[Double](0).foldLeft(lit(0)) { (acc, b) =>
        acc + when(sc >= lit(b), lit(1)).otherwise(lit(0))
      }
      df.withColumn("stage", stage.cast("int"))
    }
  }

  /** Best k rows per key by an arbitrary SCORE (desc, id asc tiebreak)
    * — "keep the 100 highest-quality docs per domain", the curation
    * cut [[samplePerKey]] is the uniform special case of. Bounded
    * map-side heaps: each partition ships at most k rows per key into
    * the shuffle (O(partitions·keys·k)), where the QUALIFY/window
    * formulation shuffles the whole corpus. Output: (key, id, score,
    * rank) with rank 1-based in score order. */
  def topKPerKey(df: DataFrame, keyCol: String, idCol: String,
                 scoreCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val topk = TopKAggregator.udaf(k)
    df.select(col(keyCol).as("key"), col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("s"))
      .groupBy("key")
      .agg(topk(col("id"), col("s")).as("top"))
      .select(col("key").as(keyCol), posexplode(col("top")).as(Seq("p", "t")))
      .select(col(keyCol), col("t._2").as(idCol), col("t._1").as(scoreCol),
        (col("p") + 1).cast("long").as("rank"))
  }

  /** Deterministic train/val/test split on an integer id. `weights`
    * are percentages summing to 100; assignment is `id mod 100` range
    * membership — reproducible across engines and runs, and stable
    * under corpus growth (a doc keeps its split forever). */
  def splitById(df: DataFrame, idCol: String,
                weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val bucket = pmod(col(idCol), lit(100))
    val (expr0, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, lo), (name, w)) =>
        (when(bucket >= lo && bucket < lo + w, name).otherwise(acc), lo + w)
    }
    df.withColumn("split", expr0)
  }

  /** Deterministic training-order shuffle key: md5 of (seed ":" id).
    * Ordering a corpus by this key is a seeded pseudo-random
    * permutation that any engine reproduces — the "shuffle the corpus
    * before training" step without RNG state. Different seeds give
    * independent permutations (new data order per epoch). */
  def shuffleKey(id: Column, seed: Long): Column =
    md5(concat_ws(":", lit(seed.toString), id.cast("string")).cast("binary"))

  /** Write the corpus in seeded-shuffle order: one range shuffle on the
    * shuffle key (sampled split points → evenly sized files), per-file
    * local sort, helper column dropped before the bytes land. Readers
    * that consume files in name order stream a deterministic
    * pseudo-random permutation — no global sort, no single-task
    * bottleneck (the [[Layout.zorderWrite]] write shape, keyed by
    * [[shuffleKey]]). */
  def shuffleWrite(df: DataFrame, idCol: String, seed: Long,
                   numFiles: Int, path: String): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    df.withColumn("__graft_shuffle", shuffleKey(col(idCol), seed))
      .repartitionByRange(numFiles, col("__graft_shuffle"))
      .sortWithinPartitions("__graft_shuffle")
      .drop("__graft_shuffle")
      .write.mode("overwrite").parquet(path)
  }

  /** LEAKAGE-FREE train/val/test split: near-duplicate documents must
    * land on the SAME side, or the eval split silently contains copies
    * of training docs ([[splitById]] splits per doc and has exactly
    * that leak once dups exist). `labels` is the (id, rep) component
    * table from [[Dedup.canonicalizeCc]] over near-dup pairs; the
    * split decision hashes the component representative (portable
    * md5 mod 100 against percentage ranges), so every member inherits
    * the rep's side, singletons hash their own id, and assignment
    * stays stable under corpus growth. One id-keyed join against the
    * pair-scale label table — the corpus never shuffles. */
  def splitLeakageFree(df: DataFrame, idCol: String, labels: DataFrame,
                       weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val grp = coalesce(col("rep"), col(idCol))
    val bucket = pmod(graft.functions.Hashes.md5Hash64(grp), lit(100L))
    val (expr0, _) = weights.foldLeft((lit(null).cast("string"), 0)) {
      case ((acc, lo), (name, w)) =>
        (when(bucket >= lo && bucket < lo + w, name).otherwise(acc), lo + w)
    }
    df.join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("split", expr0)
      .drop("rep")
  }

  /** Exact quantiles of a numeric column (linear interpolation),
    * matching SQL quantile_cont semantics. Exact percentile buffers the
    * column per group — use for gate/oracle comparisons and
    * dimension-scale inputs; at corpus scale use `quantilesApprox`. */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame =
    df.agg(percentile(col(valueCol),
      array(qs.map(lit(_)): _*)).as("quantiles"))

  /** Approximate quantiles via approx_percentile (Greenwald-Khanna
    * sketch): mergeable fixed-size state, so the aggregation is
    * map-side-partial + tiny shuffle — the 100 TB path. `accuracy`
    * bounds RANK error: the returned value's true rank is within
    * n/accuracy of the requested one (default 10000 → 0.01% of rows).
    * Returns a plain value from the column (no interpolation), so it
    * differs from `quantiles` by at most the value-span of that rank
    * window. */
  def quantilesApprox(df: DataFrame, valueCol: String, qs: Seq[Double],
                      accuracy: Int = 10000): DataFrame =
    df.agg(approx_percentile(col(valueCol),
      array(qs.map(lit(_)): _*), lit(accuracy)).as("quantiles"))

  /** Deterministic source-weighted corpus mixture: keep each document
    * with its source's probability, decided by the document id's
    * portable hash — reproducible across engines and runs, stable
    * under corpus growth (a kept doc stays kept), zero shuffle (pure
    * filter in the scan). Sources absent from `weights` default to
    * `defaultWeight`. The core pretraining-mixture op: upweight books,
    * downsample web, drop a contaminated source outright. */
  def weightedMixture(df: DataFrame, idCol: String, sourceCol: String,
                      weights: Map[String, Double],
                      defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 1),
      "weights must be probabilities in [0, 1]")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    df.where(pmod(graft.functions.Hashes.md5Hash64(col(idCol)), lit(10000L))
      .cast("double") < w * 10000.0)
  }

  /** [[weightedMixture]] generalized past probability 1: weight 2.3
    * means every doc of that source appears twice and a deterministic
    * hash-chosen 30% of them a third time — the UPSAMPLING half of
    * pretraining mixtures ("2.3 epochs of books, 0.5 of web"), which
    * a keep/drop filter cannot express. Output repeats input rows
    * with a 0-based `copy` column (downstream shuffles/packing treat
    * (id, copy) as the key). Weight w<=1 degenerates to exactly
    * weightedMixture's keep set (copy 0). Zero shuffle: a per-row
    * explode of at most ceil(w) elements in the scan. */
  def upsampleMixture(df: DataFrame, idCol: String, sourceCol: String,
                      weights: Map[String, Double],
                      defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, p)) =>
      when(col(sourceCol) === s, lit(p)).otherwise(acc)
    }
    val extra = (pmod(graft.functions.Hashes.md5Hash64(col(idCol)), lit(10000L))
      .cast("double") < (w - floor(w)) * 10000.0).cast("long")
    df.withColumn("__n", floor(w).cast("long") + extra)
      .where(col("__n") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** EXACT per-source token-budget sampling: keep each source's docs
    * in deterministic hash order until the budget is hit — "30B web
    * tokens, 5B book tokens" as a reproducible cut rather than a
    * probabilistic one ([[weightedMixture]] hits a RATE, not a
    * TOTAL). A doc is kept iff the tokens BEFORE it (exclusive cumsum
    * in (hash, id) order) are under its source's budget, so a source
    * overshoots by at most its last doc — packBySize's slicing rule.
    *
    * Scale shape: the naive per-source window serializes each source
    * onto one task (a 60%-web corpus = one straggler). This runs the
    * packChunks two-phase prefix sum instead, partitioned by (source,
    * hash-bucket): per-bucket sums (tiny aggregate) broadcast back as
    * exclusive bucket offsets, the row-level window runs per (source,
    * bucket) — ONE corpus shuffle on well-spread keys, no straggler.
    * Budget semantics are bucketing-invariant (the cumsum is global
    * per source), so `buckets` only shapes the plan. */
  def sampleTokenBudget(df: DataFrame, idCol: String, sourceCol: String,
                        tokCol: String, budgets: Map[String, Long],
                        defaultBudget: Long = Long.MaxValue,
                        buckets: Int = 0): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    val p = if (buckets > 0) buckets
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val width = 1000000L / p + 1
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    val narrow = df
      .withColumn("__h",
        pmod(graft.functions.Hashes.md5Hash64(col(idCol)), lit(1000000L)))
      .withColumn("__b", expr(s"__h DIV ${width}L"))
    val offs = narrow.groupBy(sourceCol, "__b")
      .agg(sum(col(tokCol).cast("long")).as("__bsum"))
      .withColumn("__boff",
        coalesce(sum("__bsum").over(
          Window.partitionBy(sourceCol).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(sourceCol), col("__b"), col("__boff"))
    val local = Window.partitionBy(sourceCol, "__b").orderBy("__h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    narrow.join(broadcast(offs), Seq(sourceCol, "__b"))
      .withColumn("__cum",
        col("__boff") + coalesce(sum(col(tokCol).cast("long")).over(local), lit(0L)))
      .where(col("__cum") < budget)
      .drop("__h", "__b", "__boff", "__cum")
  }

  /** [[sampleTokenBudget]] with QUALITY-ORDERED spend: each source's
    * budget buys its BEST tokens — docs kept in (score DESC, id ASC)
    * order until the budget is hit — rather than a hash-random slice.
    * This is the production curation form the moment a quality signal
    * exists (Text.qualityScore, a classifier logit, PageRank): "5B of
    * our HIGHEST-quality book tokens", not "5B random book tokens".
    *
    * Scale shape: the same two-phase prefix sum as sampleTokenBudget,
    * but buckets must follow the SCORE order, so they come from
    * per-source approx-quantile boundaries (ONE corpus aggregate,
    * GK-sketch — metadata-scale result) instead of the id hash:
    * bucket i's scores all sort before bucket i+1's, per-bucket sums
    * broadcast back as exclusive offsets, and the row-level window
    * runs per (source, bucket). The CUT stays exact regardless of
    * boundary placement — bucketing only shapes the plan (same
    * invariance argument as sampleTokenBudget, spec'd at 1/7/64
    * buckets) — so approximate quantiles never make the result
    * approximate. NULL scores sort last (worst), after all scored
    * docs. */
  def sampleTokenBudgetBest(df: DataFrame, idCol: String, sourceCol: String,
                            tokCol: String, scoreCol: String,
                            budgets: Map[String, Long],
                            defaultBudget: Long = Long.MaxValue,
                            buckets: Int = 0): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "budgets must be non-negative")
    val p = math.max(1, if (buckets > 0) buckets
                         else df.sparkSession.sessionState.conf.numShufflePartitions)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    // NULL-safe ordering key: nulls become -inf so they land in the
    // last bucket AND sort after every real score (desc_nulls_last
    // in the window keeps the within-bucket order consistent).
    val scoreKey = coalesce(col(scoreCol).cast("double"),
      lit(Double.NegativeInfinity))
    val withB =
      if (p == 1) df.withColumn("__b", lit(0))
      else {
        // ascending boundaries b_1 <= ... <= b_{p-1}; a doc's bucket is
        // the count of boundaries STRICTLY above its score — bucket 0
        // holds the best scores, equal scores always share a bucket.
        val bnds = df.groupBy(sourceCol)
          .agg(percentile_approx(scoreKey,
            typedlit((1 until p).map(_.toDouble / p)), lit(10000)).as("__bnds"))
        df.join(broadcast(bnds), Seq(sourceCol))
          .withColumn("__b",
            size(filter(col("__bnds"), b => b > scoreKey)))
          .drop("__bnds")
      }
    val offs = withB.groupBy(sourceCol, "__b")
      .agg(sum(col(tokCol).cast("long")).as("__bsum"))
      .withColumn("__boff",
        coalesce(sum("__bsum").over(
          Window.partitionBy(sourceCol).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(sourceCol), col("__b"), col("__boff"))
    val local = Window.partitionBy(sourceCol, "__b")
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offs), Seq(sourceCol, "__b"))
      .withColumn("__cum",
        col("__boff") + coalesce(sum(col(tokCol).cast("long")).over(local), lit(0L)))
      .where(col("__cum") < budget)
      .drop("__b", "__boff", "__cum")
  }

  /** Bucketed table write: `bucketBy(key)` + sorted buckets, so two
    * tables bucketed the same way join WITHOUT an exchange — the
    * co-located fact-fact join that replaces the biggest shuffle in a
    * repeated-join workload (pay the shuffle once at write time,
    * never again at read time). Catalog-managed (saveAsTable) because
    * bucket metadata lives in the table catalog. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Write with controlled file layout: range-partition by `sortCol`
    * (clustered files → parquet min/max pruning works downstream) and
    * cap rows per file — the small-files and giant-files guards for a
    * 100 TB table. */
  def writeClustered(df: DataFrame, path: String, sortCol: String,
                     numFiles: Int, maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Neyman allocation (Neyman 1934) of a sampling budget across
    * strata: n_h ∝ N_h·σ_h — under a fixed total, variance-optimal
    * stratified sampling oversamples big AND noisy strata. The
    * eval-set construction step after [[splitStratified]] decides the
    * strata: how many rows each stratum DESERVES.
    *
    * Exact-replay discipline: σ_h comes from exact integer moments
    * (callers pass an integer-unit column — the corrMatrix contract)
    * with one IEEE √ close, then QUANTIZED to integer units, so the
    * weight w_h = N_h·σ_int is a BIGINT; the allocation itself is
    * largest-remainder apportionment in pure integer arithmetic —
    * base_h = B·w_h div W, leftovers to the largest B·w_h mod W
    * (ties by stratum asc) — which both sums EXACTLY to the budget
    * and replays in any engine. Zero-variance strata get weight 0
    * (they need one row at most — take it from the base share of a
    * caller-side floor if needed).
    *
    * Windows run over the STRATUM list — metadata-scale. Output:
    * (stratum, n_rows, sigma_int, alloc). */
  def neymanAllocation(df: DataFrame, stratumCol: String,
                       valueCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val dec = DecimalType(38, 0)
    val x = col(valueCol).cast("long").cast(dec)
    val g = df.where(col(valueCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_rows"), sum(x).as("s1"),
        sum(x * x).as("s2"))
    def d(c: String) = col(c).cast("double")
    val nD = d("n_rows")
    val varN = (nD * d("s2") - d("s1") * d("s1")) / (nD * (nD - lit(1.0)))
    val sigma = when(col("n_rows") >= 2 && varN > 0,
      round(sqrt(varN))).otherwise(lit(0.0)).cast("long")
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy(col("rem").desc, col("stratum").asc)
    g.withColumn("sigma_int", sigma)
      .withColumn("w", col("n_rows") * col("sigma_int"))
      .withColumn("tw", sum("w").over(wAll))
      .withColumn("base",
        when(col("tw") > 0, expr(s"(${budget}L * w) div tw"))
          .otherwise(lit(0L)))
      .withColumn("rem",
        when(col("tw") > 0, expr(s"(${budget}L * w) % tw"))
          .otherwise(lit(0L)))
      .withColumn("left", lit(budget) - sum("base").over(wAll))
      .withColumn("pri", row_number().over(wRem))
      .select(col("stratum"), col("n_rows"), col("sigma_int"),
        when(col("tw") > 0,
          col("base") + when(col("pri") <= col("left"), 1L)
            .otherwise(0L)).otherwise(lit(0L)).as("alloc"))
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    * more effective language sampling for large-scale multilingual
    * pretraining", arXiv:2304.09151): spread a token budget as
    * UNIFORMLY as possible across groups while capping each group at
    * `maxEpochs` passes over its own data — the anti-power-law
    * alternative to [[temperatureWeights]] (which still tilts toward
    * head languages).
    *
    * Closed-form waterfill in EXACT integers: sort groups by capacity
    * c_i = maxEpochs·n_i ascending; group k is CAPPED iff even
    * granting every remaining group c_k fits the remaining budget —
    *   c_k·(n−k+1) ≤ B − prefix_{k−1}
    * (capping is a prefix of the sorted order since both sides are
    * monotone); uncapped groups split the residual R equally with the
    * R mod m leftover crumbs going to the first uncapped groups in
    * (capacity, group) order. Sums EXACTLY to min(B, Σc); a crumb can
    * never push an uncapped group past its capacity (first uncapped k
    * has c_k·m > R ⇒ c_k ≥ R div m + 1). Windows run over the GROUP
    * list — metadata-scale. Output: (group, n_units, capacity,
    * capped, alloc). */
  def unimaxAllocation(df: DataFrame, groupCol: String, unitsCol: String,
                       budget: Long, maxEpochs: Long): DataFrame = {
    require(budget >= 0 && maxEpochs >= 1,
      s"budget >= 0 and maxEpochs >= 1 required, got $budget, $maxEpochs")
    val g = df.where(col(unitsCol).isNotNull)
      .groupBy(col(groupCol).as("group"))
      .agg(sum(col(unitsCol).cast("long")).as("n_units"))
      .withColumn("capacity", col("n_units") * lit(maxEpochs))
    val wOrd = Window.orderBy(col("capacity").asc, col("group").asc)
    val wAll = Window.partitionBy()
    val ranked = g
      .withColumn("k", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("prefix", coalesce(sum("capacity").over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        col("capacity") * (col("n") - col("k") + 1) <=
          lit(budget) - col("prefix"))
    val withR = ranked
      .withColumn("cap_total",
        coalesce(sum(when(col("capped"), col("capacity"))).over(wAll),
          lit(0L)))
      .withColumn("m", col("n") -
        coalesce(sum(when(col("capped"), 1L)).over(wAll), lit(0L)))
      .withColumn("r", lit(budget) - col("cap_total"))
      .withColumn("uncapped_rank", row_number().over(
        Window.orderBy(col("capped").asc, col("capacity").asc,
          col("group").asc)))
    withR.select(col("group"), col("n_units"), col("capacity"),
      col("capped"),
      when(col("capped"), col("capacity"))
        .otherwise(expr("r div m") +
          when(col("uncapped_rank") <= expr("r % m"), 1L)
            .otherwise(0L))
        .as("alloc"))
  }

  /** One DoReMi domain-reweighting step (Xie et al. 2023, "DoReMi:
    * Optimizing data mixtures speeds up language model pretraining",
    * arXiv:2305.10429): the proxy-training loop's multiplicative-
    * weights update on the domain distribution —
    *   w′_i ∝ w_i · exp(η · ℓ_i)   (ℓ_i = per-domain excess loss),
    *   α_i  = (1−c) · w′_i/Σw′ + c/k   (uniform smoothing)
    * — run repeatedly, it concentrates the mixture on domains where
    * the proxy underperforms. [[temperatureWeights]] is the static
    * heuristic; this is the optimizer step a tuning pipeline iterates.
    *
    * Exact-replay discipline: the one transcendental (exp) is
    * micro-rounded PER DOMAIN before anything aggregates, then the
    * normalize and smooth steps run in pure integer ppm arithmetic
    * (non-negative DIVs only — the cross-engine floor/trunc trap):
    *   raw_i  = round(w_ppm_i · exp(η_μ·ℓ_μ/1e12))        (BIGINT)
    *   α_ppm_i = ((1e6−c_ppm)·((raw_i·1e6) div Σraw)) div 1e6
    *             + c_ppm div k.
    * Rounding crumbs (≤ k ppm total) are deliberate — exactness
    * beats summing to exactly 1e6.
    *
    * Plan shape: domain-count-scale metadata only — one k-row input,
    * a 1-row total broadcast back; never row-scale. Output: (domain,
    * weight_ppm, raw_micro, alpha_ppm). */
  def doremiStep(domains: DataFrame, domainCol: String,
                 weightPpmCol: String, lossMicroCol: String,
                 etaMicro: Long, smoothPpm: Long): DataFrame = {
    require(smoothPpm >= 0 && smoothPpm <= 1000000L,
      s"smoothPpm must be in [0, 1e6], got $smoothPpm")
    val w = col(weightPpmCol).cast("long")
    val l = col(lossMicroCol).cast("long")
    val raw = round(w.cast("double") *
      exp(lit(etaMicro).cast("double") * l.cast("double") / lit(1e12)))
      .cast("long")
    val base = domains.select(col(domainCol).as("domain"),
      w.as("weight_ppm"), raw.as("raw_micro"))
    val tot = base.agg(sum("raw_micro").as("tot"),
      count(lit(1)).as("k"))
    base.crossJoin(broadcast(tot))
      .select(col("domain"), col("weight_ppm"), col("raw_micro"),
        expr(s"((${1000000L - smoothPpm}L * ((raw_micro * 1000000L) div tot))" +
          s" div 1000000L) + (${smoothPpm}L div k)").as("alpha_ppm"))
  }
}
