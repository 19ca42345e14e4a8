package graft
package entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ffiec, Text, Vectors}
import graft.operators.{CombineParts, Dedup, Graph, KeyChecks, Knn, LongPivot, Pq, Sampling, TextAnalytics}
import graft.sources.{Scan, XbrlZip}
import graft.streaming.Sessions

import graft.entry.EntryHelpers._

/** Gate registry, corpus analytics, rounds 5-6 (stats tests, time series, graphs) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8; zero behavior
  * change, every entry byte-identical to the monolith at split
  * time). SparkEntry concatenates the family maps back into the
  * driver contract.
  */
private[graft] object GatesAnalyticsStats {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

// Week-over-week deltas on the zero-filled daily order-count grid;
    // rows without a comparable prior period (first 7 grid days, or a
    // zero base) are filtered so every output column is a non-null
    // long (driver-comparator dtype contract).
    "q174_period_delta" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("grp"),
          to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n"))
      val grid = operators.TimeSeries.gapFill(daily, "grp", "d", "n",
        forward = false)
      operators.TimeSeries.periodDelta(grid, "grp", "d", "n", lagDays = 7)
        .where(col("prev_value").isNotNull && col("prev_value") =!= 0L)
        .orderBy("grp", "d")
    }),

// Per-source token-concentration audit: Gini over each source's
    // per-document token counts (exact rank moments → fixed-order
    // float → micros). The mixture-report statistic: a source whose
    // tokens sit in a handful of giant documents upsamples those
    // documents under doc-level sampling.
    "q160_gini" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Stats.giniByKey(d, "source", "n_tokens", "doc_id")
        .orderBy("key")
    }),

// User-journey transition matrix: P(next event type | event type)
    // over per-user time-ordered streams; (user_id, ts) is unique so
    // the ordering is total without a tie-break.
    "q161_markov" -> ((s, dir) => {
      operators.Sequences.markovTransitions(events(s, dir), "user_id", "ts",
        "event_type")
        .orderBy("from_state", "to_state")
    }),

// First/last-touch revenue attribution: purchases credit the
    // first and last non-purchase event in the strictly-preceding
    // 7-day window; no touch in window → NULL channel.
    "q162_attribution" -> ((s, dir) => {
      operators.Sequences.touchAttribution(events(s, dir), "user_id", "ts",
        "event_type", "value", "purchase", lookbackDays = 7)
        .orderBy("touch", "channel")
    }),

// Exact per-node triangle counts on the co-purchase graph (parts
    // sharing an order, thinned to the %10 partkey stratum so the
    // graph stays bench-scale); degree-ordered node-iterator inside.
    "q163_triangles" -> ((s, dir) => {
      val lp = t(s, dir, "lineitem")
        .where(col("l_partkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = lp.join(lp.select(col("o"), col("p").as("p2")), Seq("o"))
        .where(col("p") < col("p2"))
        .select(col("p").as("src"), col("p2").as("dst"))
      operators.Graph.triangleCounts(e, "src", "dst")
        .orderBy("node")
    }),

// Same-customer overlapping order intervals ([orderdate,
    // orderdate + 1..30 days]) via the binned overlap join; the
    // oracle is the naive quadratic self-join — bins must only prune.
    "q164_interval_overlap" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .select(col("o_custkey").as("k"), col("o_orderkey").as("id"),
          to_date(col("o_orderdate")).as("start_d"),
          date_add(to_date(col("o_orderdate")),
            (col("o_orderkey") % 30 + 1).cast("int")).as("end_d"))
      operators.AsOfJoin.overlapJoin(iv, "k", "id", "start_d", "end_d",
        binDays = 30)
        .select(col("k_a").as("k"), col("id_a"), col("id_b"))
        .orderBy("k", "id_a", "id_b")
    }),

// A/B readout: Welch z per event type, users split by parity;
    // moments exact, z replayed in fixed float order.
    "q165_welch" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("g", when(col("user_id") % 2 === 0, "a").otherwise("b"))
        .withColumn("v_milli", round(col("value") * 1000).cast("long"))
      operators.Stats.welchZ(ev, "event_type", "g", "a", "b", "v_milli")
        .orderBy("stratum")
    }),

// Pareto frontier per brand: parts no brand-mate beats on both
    // (price, size); window-only sort-scan skyline vs the oracle's
    // NOT EXISTS ground truth.
    "q166_skyline" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .withColumn("price_cents", round(col("p_retailprice") * 100).cast("long"))
      operators.Stats.skyline2d(p, "price_cents", "p_size", Seq("p_brand"))
        .select("p_brand", "p_partkey", "price_cents", "p_size")
        .orderBy("p_brand", "p_partkey")
    }),

// Per-user integer EWMA (α=1/2) of event values in milli-units —
    // the fold replays exactly via DuckDB's list_reduce.
    "q167_ewma" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("v_milli", round(col("value") * 1000).cast("long"))
      operators.TimeSeries.ewmaHalfPerKey(ev, "user_id", "ts", "v_milli")
        .orderBy("user_id")
    }),

// Market-basket rules over order baskets: pairs with support >= 3,
    // confidence/lift in micros from exact counts.
    "q168_assoc_rules" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      operators.Assoc.pairRules(li, "b", "i", minSupport = 3)
        .orderBy("item_a", "item_b")
    }),

// Benford first-digit screen over order totals in cents, per
    // priority stratum — expected proportions are driver-computed
    // constants shared verbatim with the oracle; deviation is an
    // integer subtraction (no cross-engine float path).
    "q169_benford" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      operators.Stats.benfordDeviation(o, "o_orderpriority", "cents")
        .orderBy("key", "digit")
    }),

// Two-sample KS drift per priority stratum: open vs finished
    // orders on the cents distribution — the argmax runs in exact
    // integer cross-products, one float division at the end.
    "q170_ks_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      operators.Stats.ksByStratum(o, "o_orderpriority", "o_orderstatus",
        "O", "F", "cents")
        .orderBy("stratum")
    }),

// Top user-journey trigrams: (user_id, ts) is unique so the lead
    // ordering is total; top-25 cut tie-broken on the path itself.
    "q171_top_paths" -> ((s, dir) => {
      operators.Sequences.topPaths3(events(s, dir), "user_id", "ts",
        "event_type", topN = 25)
        .orderBy(col("n").desc, col("p1"), col("p2"), col("p3"))
    }),

// Histogram-store lifecycle: write half the orders' cents into
    // per-priority fixed bins, append the other half as a second
    // shard, compact, then read exact lower-edge quantiles — the
    // distribution member of the HLL/CMS mergeable-store family. The
    // oracle replays binning + the ceil-rank rule over ALL orders
    // (shard merge is cell-wise addition, so they must agree).
    "q173_hist_store" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("p"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_hist").toString
      operators.HistStore.write(o.where(col("o_orderkey") % 2 === 0),
        "p", "cents", tmp, lo = 0L, width = 500000L, bins = 64)
      operators.HistStore.append(o.where(col("o_orderkey") % 2 === 1),
        "p", "cents", tmp)
      operators.HistStore.compactStore(s, tmp)
      operators.HistStore.quantiles(s, tmp,
        Seq(250000L, 500000L, 900000L, 990000L))
        .orderBy("key", "q_micro")
    }),

// Flesch reading ease per doc slice — scan-only projection; the
    // regex heuristics are RE2-safe so DuckDB counts identically.
    // Wordless docs are filtered (their score is NULL by contract, and
    // the driver's hasher coerces nullable int64 → float64).
    "q172_readability" -> ((s, dir) => {
      operators.TextAnalytics.readability(
        t(s, dir, "documents").where(col("doc_id") % 7 === 2),
        "doc_id", "text")
        .where(col("n_words") > 0)
        .orderBy("doc_id")
    }),

// MDRM dictionary build under the gate (ref: data-raw/ffiec_dict.R):
    // a deterministic MDRM-shaped export — banner line the reader must
    // skip, Fed column headers needing snake-casing, quoted embedded
    // commas, M/d/yyyy h:mm:ss a dates with the 12/31/9999 open-ended
    // sentinel — is synthesized from `part` into a real zip, then
    // readMdrm → itemsFromMdrm ⋈ itemDetailsFromMdrm rebuild the
    // metadata tables. The oracle recomputes every snake-case/sentinel/
    // case-restoration/typing rule in SQL from the same table. The
    // driver-side collect is the operator's contract: MDRM is
    // metadata-scale (the Fed's full dictionary is tens of MB).
    "q175_mdrm_dict" -> ((s, dir) => {
      val rows = t(s, dir, "part")
        .select(col("p_partkey").cast("long").as("k"), col("p_name"))
        .orderBy("k").collect()
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_mdrm")
      val zipPath = s"$tmpDir/MDRM.zip"
      val zout = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zipPath))
      zout.putNextEntry(new java.util.zip.ZipEntry("MDRM_CSV.csv"))
      val sb = new StringBuilder
      sb.append("PUBLIC MDRM export - banner line the reader must skip\n")
      sb.append("\"Mnemonic\",\"Item Code\",\"Start Date\",\"End Date\"," +
        "\"Item Name\",\"Confidentiality\",\"ItemType\",\"Reporting Form\"," +
        "\"Description\",\"SeriesGlossary\"\n")
      rows.foreach { r =>
        val k = r.getLong(0); val nm = r.getString(1)
        val code = f"$k%05d"
        val start = s"${k % 12 + 1}/${k % 28 + 1}/${2000 + k % 20} 12:00:00 AM"
        val end = if (k % 2 == 0) "12/31/9999 11:59:59 PM"
                  else "6/30/2010 12:00:00 AM"
        val conf = if (k % 2 == 0) "Y" else "N"
        val itype = if (k % 3 == 0) "F" else "D"
        sb.append(s""""RCON","$code","$start","$end","u.s. $nm ffiec tier 1",""" +
          s""""$conf","$itype","FFIEC 031","Loans, net of $nm","g"""" + "\n")
      }
      zout.write(sb.toString.getBytes("UTF-8"))
      zout.closeEntry(); zout.close()
      val mdrm = graft.meta.Items.readMdrm(s, zipPath)
      val typed = t(s, dir, "part").select(
        concat(lit("RCON"),
          lpad(col("p_partkey").cast("string"), 5, "0")).as("item"),
        element_at(array(lit("integer"), lit("string"), lit("date")),
          (col("p_partkey").cast("long") % 3 + 1).cast("int")).as("data_type"))
      val items = graft.meta.Items.itemsFromMdrm(mdrm, typed)
      val details = graft.meta.Items.itemDetailsFromMdrm(mdrm, typed)
      items.join(details, Seq("item"))
        .select(col("item"), col("mnemonic"), col("item_code"),
          col("item_name"), col("data_type"), col("reporting_form"),
          col("confidentiality"), col("description"), col("itemtype"),
          col("start_date"),
          when(col("end_date").isNull, lit(1L)).otherwise(lit(0L)).as("end_open"),
          coalesce(col("end_date"),
            lit(java.sql.Date.valueOf("1900-01-01"))).as("end_date_f"))
        .orderBy("item")
    }),

// Exact Jaccard set-similarity self-join with lossless PPJoin
    // prefix filtering; the %3 stratum keeps the ORACLE's naive
    // token-inverted self-join bench-scale (the Spark side would take
    // the full corpus).
    "q176_set_sim_join" -> ((s, dir) => {
      operators.Dedup.setSimilarityJoin(
        t(s, dir, "documents").where(col("doc_id") % 3 === 0),
        "doc_id", "text", tau = 0.7)
        .orderBy("id_a", "id_b")
    }),

// Functional-dependency audit: orders whose lines carry more than
    // one return flag violate l_orderkey → l_returnflag.
    "q177_fd_violations" -> ((s, dir) => {
      operators.KeyChecks.fdViolations(t(s, dir, "lineitem"),
        Seq("l_orderkey"), "l_returnflag")
        .orderBy("l_orderkey")
    }),

// Sorted-neighborhood linkage candidates over a (segment, banded
    // balance) blocking key; exact zipWithIndex total order inside.
    "q178_sorted_neighborhood" -> ((s, dir) => {
      val key = concat(col("c_mktsegment"),
        lpad((floor(col("c_acctbal")) + 1000).cast("long").cast("string"),
          5, "0"))
      operators.Dedup.sortedNeighborhoodPairs(t(s, dir, "customer"),
        "c_custkey", key, w = 3)
        .orderBy("pos_a", "pos_b")
    }),

// Reciprocal-rank fusion of two length signals (chars, tokens):
    // exact descending two-phase ranks, integer-division rrf terms.
    "q179_rrf_fuse" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        Text.tokenCount(col("text")).cast("long").as("n_tok"))
      operators.Sampling.rrfFuse(d, "doc_id", Seq("n_chars", "n_tok"), k = 60)
        .orderBy("doc_id")
    }),

// Interpolated Kneser-Ney bigram table (d = 1/2) over the corpus;
    // continuation-count backoff, fixed-order float replay.
    "q180_kn_bigram" -> ((s, dir) => {
      operators.TextAnalytics.knBigramTable(t(s, dir, "documents"), "text",
        minCount = 5)
        .orderBy("w1", "w2")
    }),

// Per-source winsorization of document lengths to the exact
    // [p5, p95] band; thresholds from distinct-value cumulative
    // counts (no per-row hot-key window).
    "q181_winsorize" -> ((s, dir) => {
      operators.Stats.winsorizePerKey(t(s, dir, "documents"), "source",
        "n_chars", "doc_id", pLoMicro = 50000L, pHiMicro = 950000L)
        .orderBy("key", "id")
    }),

// Chi-square contingency cells source × lang: exact integral-
    // division micros (DECIMAL div BIGINT), margins broadcast back.
    "q182_chi2_cells" -> ((s, dir) => {
      operators.KeyChecks.chiSquareCells(t(s, dir, "documents"),
        "source", "lang")
        .orderBy("a", "b")
    }),

// Exact integer Gram matrix of the embedding corpus (micro-
    // quantized, DECIMAL-summed): the one-pass second-moment reduce
    // PCA/whitening starts from.
    "q183_gram_matrix" -> ((s, dir) => {
      operators.Pca.gramMicro(t(s, dir, "embeddings"), "embedding")
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("g").cast("long").as("g"))
        .orderBy("i", "j")
    }),

// Add-one-smoothed categorical KL between the even/odd doc_id
    // halves over source — the mixture-drift screen, per-value terms.
    "q184_categorical_kl" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.KeyChecks.categoricalKl(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
        "source")
        .orderBy("v")
    }),

// Cross-source quantile normalization of document lengths onto
    // the pooled distribution; exact ranks both sides.
    "q185_quantile_normalize" -> ((s, dir) => {
      operators.Sampling.quantileNormalizeByKey(t(s, dir, "documents"),
        "source", "n_chars", "doc_id")
        .orderBy("key", "id")
    }),

// FastSS deletion-neighborhood edit-distance join (k = 1) over
    // customer names; exhaustive-oracle-verified lossless.
    "q186_editdist_pairs" -> ((s, dir) => {
      operators.Dedup.editDistancePairs(
        t(s, dir, "customer").where(col("c_nationkey") < 5),
        "c_custkey", "c_name", k = 1)
        .orderBy("id_a", "id_b")
    }),

// Survivorship per nation cluster: max balance, min name,
    // most-frequent segment (tie → smallest) — the golden record.
    "q187_golden_record" -> ((s, dir) => {
      operators.Dedup.goldenRecord(t(s, dir, "customer"), "c_nationkey",
        maxCols = Seq("c_acctbal"), minCols = Seq("c_name"),
        modeCols = Seq("c_mktsegment"))
        .orderBy("cluster")
    }),

// Nonparametric src0-vs-src1 length comparison per language:
    // exact half-unit rank sums over distinct-value counts.
    "q188_mann_whitney" -> ((s, dir) => {
      operators.Stats.mannWhitneyU(t(s, dir, "documents"), "lang",
        "source", "src0", "src1", "n_chars")
        .orderBy("stratum")
    }),

// 1-D nearest matching src0 → src1 on length per language; two
    // linear as-of merges, ties break low.
    "q189_nn_match" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      operators.Stats.nearestMatch1d(
        d.where(col("source") === "src0"), d.where(col("source") === "src1"),
        "lang", "n_chars", "doc_id")
        .orderBy("stratum", "id")
    }),

// Lag-1 autocorrelation of daily event volume per type — exact
    // integer moments over the (d, d+1) arithmetic pair join.
    "q190_autocorr" -> ((s, dir) => {
      operators.TimeSeries.lagCorrDaily(events(s, dir), "event_type", "ts",
        lag = 1)
        .orderBy("key")
    }),

// The incremental-components lifecycle under the gate: write a
    // mod-6 chain forest, append the mod-3 chain (merges 6 → 3
    // classes), compact (pending folded, one-shard forest), then
    // append a single (1,2) bridge — components must read it through
    // the fresh pending without recomputing history. Closed form:
    // rep = 0 for ids ≡ 0 (mod 3), else 1.
    "q191_cc_store" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_cc_store").toString
      // id cap: chain depth (and so star-rounds) stays fixed across
      // sf — the gate exercises the lifecycle, not an O(log diam) soak
      val k = t(s, dir, "customer").select(col("c_custkey").cast("long").as("k"))
        .where(col("k") < 2000)
      operators.CcStore.write(
        k.where(col("k") > 6)
          .select(col("k").as("id_a"), (col("k") - 6).as("id_b")), tmp)
      operators.CcStore.append(
        k.where(col("k") > 3)
          .select(col("k").as("id_a"), (col("k") - 3).as("id_b")), tmp)
      operators.CcStore.compactStore(s, tmp)
      operators.CcStore.append(Seq((1L, 2L)).toDF("id_a", "id_b"), tmp)
      operators.CcStore.components(s, tmp).orderBy("id")
    }),

// Bayardo-style lossless cosine all-pairs over distinct token
    // sets; pair membership decided in pure integers (inter²·10¹² vs
    // τ²micro·sa·sb), graded against the exhaustive shared-token join.
    "q192_cosine_pairs" -> ((s, dir) => {
      operators.Dedup.cosineSetJoin(
        t(s, dir, "documents").where(col("doc_id") % 3 === 1),
        "doc_id", "text", tau = 0.6)
        .orderBy("id_a", "id_b")
    }),

// Two-feature OLS per event type: value ~ hour + weekday from
    // exact DECIMAL moments, Cramer solve in one fixed float order.
    "q196_ols2" -> ((s, dir) => {
      operators.Stats.ols2PerKey(
        events(s, dir).select(col("event_type"),
          hour(col("ts")).cast("long").as("x1"),
          dayofweek(col("ts")).cast("long").as("x2"),
          round(col("value") * 1000).cast("long").as("y")),
        "event_type", "x1", "x2", "y")
        .orderBy("key")
    }),

// One-way ANOVA F of doc length across sources per language —
    // group moments exact, ratio quantized to q6 before the exact
    // stratum fold so the sum is order-independent.
    "q197_anova" -> ((s, dir) => {
      operators.Stats.anovaF(t(s, dir, "documents"), "lang", "source",
        "n_chars")
        .orderBy("stratum")
    }),

// Cumulative gains table of event value vs purchase outcome:
    // two-phase exact desc ranks, integer slice cuts and lift micros.
    "q198_lift" -> ((s, dir) => {
      operators.Stats.liftTable(
        events(s, dir).select(
          round(col("value") * 1000).cast("long").as("x"),
          (col("event_type") === "purchase").as("y")),
        "x", "y", bins = 10)
        .orderBy("slice")
    }),

// Per-cell mutual information source × lang — the dependence
    // screen beside q182's chi-square deviations.
    "q199_mutual_info" -> ((s, dir) => {
      operators.KeyChecks.mutualInformationCells(t(s, dir, "documents"),
        "source", "lang")
        .orderBy("a", "b")
    }),

// k-core peel on clique-plus-chain: every chain tail cascades
    // away at k = 3, the 8-clique survives intact (degree 7 each).
    "q194_kcore" -> ((s, dir) => {
      val ids = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"))
      val chain = ids.where(col("k").between(1, 99))
        .select(col("k").as("u"), (col("k") - 1).as("v"))
      val cl = ids.where(col("k") < 8)
      val clique = cl.select(col("k").as("u"))
        .crossJoin(cl.select(col("k").as("v")))
        .where(col("u") < col("v"))
      operators.Graph.kcore(chain.unionByName(clique), "u", "v", k = 3)
        .orderBy("id")
    }),

// Multi-source BFS over mod-300 chains: dist = id div 300, bounded
    // depth across sf via the id cap.
    "q195_bfs" -> ((s, dir) => {
      val ids = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("k"))
        .where(col("k") < 3000)
      val edges = ids.where(col("k") >= 300)
        .select(col("k").as("u"), (col("k") - 300).as("v"))
      operators.Graph.bfsDistances(edges, "u", "v",
        ids.where(col("k") < 300), "k")
        .orderBy("id")
    }),

// Reliability table of event value (milli-scaled) vs purchase
    // outcome: exact integer bin edges, counts, micro rates; the bin
    // spine keeps empty bins visible.
    "q193_calibration" -> ((s, dir) => {
      operators.Stats.calibrationBins(
        events(s, dir).select(
          round(col("value") * 1000).cast("long").as("v_milli"),
          (col("event_type") === "purchase").as("y")),
        "v_milli", "y", bins = 10, loMilli = 0L, hiMilli = 100000L)
        // comparator dtype contract: empty-bin NULL rate → -1 sentinel
        .withColumn("rate_micro", coalesce(col("rate_micro"), lit(-1L)))
        .orderBy("bin")
    }))


  val oracles: Map[String, String] = Map(

"q174_period_delta" ->
      """WITH sp AS (
        |  SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM sp),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM bounds),
        |grid AS (SELECT grp, d FROM (SELECT DISTINCT grp FROM sp) CROSS JOIN days),
        |g AS (SELECT g.grp, g.d, COALESCE(sp.n, 0) AS n FROM grid g
        |      LEFT JOIN sp ON g.grp = sp.grp AND g.d = sp.d),
        |l AS (SELECT grp, d, n,
        |        LAG(n, 7) OVER (PARTITION BY grp ORDER BY d) AS prev_value
        |      FROM g)
        |SELECT grp, d, n, CAST(prev_value AS BIGINT) AS prev_value,
        |  CAST(n - prev_value AS BIGINT) AS delta,
        |  CAST(round(1e6 * CAST(n - prev_value AS DOUBLE)
        |    / CAST(prev_value AS DOUBLE)) AS BIGINT) AS pct_micro
        |FROM l WHERE prev_value IS NOT NULL AND prev_value <> 0
        |ORDER BY grp, d""".stripMargin,

// Rank-formula Gini from the same exact moments (row_number ties
    // broken by doc_id on both sides; Σ i·x through DECIMAL(38,0)).
    "q160_gini" ->
      """WITH t AS (
        |  SELECT source AS key, doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS x
        |  FROM documents),
        |r AS (SELECT key, x,
        |        row_number() OVER (PARTITION BY key ORDER BY x, doc_id) AS i
        |      FROM t),
        |a AS (SELECT key, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS total,
        |        SUM(CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS s2
        |      FROM r GROUP BY key)
        |SELECT key, n, total,
        |  CAST(round((2.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS gini_micro
        |FROM a WHERE total > 0 ORDER BY key""".stripMargin,

"q161_markov" ->
      """WITH p AS (
        |  SELECT event_type AS from_state,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS to_state
        |  FROM events),
        |c AS (SELECT from_state, to_state, COUNT(*) AS n
        |      FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS row_total
        |      FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, n,
        |  CAST(round(CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) * 1e6)
        |       AS BIGINT) AS p_micro
        |FROM c JOIN t USING (from_state)
        |ORDER BY from_state, to_state""".stripMargin,

// The range frame [ts-7d, ts) in epoch micros replays Spark's
    // rangeBetween exactly; IGNORE NULLS skips other purchases.
    "q162_attribution" ->
      """WITH x AS (
        |  SELECT event_type, value, epoch_us(ts) AS e,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS) OVER w AS last_ch,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |                IGNORE NULLS) OVER w AS first_ch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |               RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
        |conv AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents
        |         FROM x WHERE event_type = 'purchase')
        |SELECT touch, channel, COUNT(*) AS n_conversions,
        |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |FROM (
        |  SELECT 'first' AS touch, first_ch AS channel, cents FROM conv
        |  UNION ALL
        |  SELECT 'last' AS touch, last_ch AS channel, cents FROM conv)
        |GROUP BY touch, channel
        |ORDER BY touch, channel NULLS FIRST""".stripMargin,

// Canonical x<y<z triangle enumeration — orientation-free ground
    // truth for the degree-ordered Spark plan; per-corner credit via
    // unnest.
    "q163_triangles" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 10 = 0),
        |e AS (
        |  SELECT DISTINCT LEAST(a.p, b.p) AS u, GREATEST(a.p, b.p) AS v
        |  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p),
        |tri AS (
        |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS node FROM tri)
        |GROUP BY node ORDER BY node""".stripMargin,

// Naive quadratic ground truth — the Spark side's binning must
    // prune candidates without changing the pair set.
    "q164_interval_overlap" ->
      """WITH iv AS (
        |  SELECT o_custkey AS k, o_orderkey AS id,
        |    CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 + 1 AS INTEGER) AS e
        |  FROM orders)
        |SELECT a.k AS k, a.id AS id_a, b.id AS id_b
        |FROM iv a JOIN iv b
        |  ON a.k = b.k AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
        |ORDER BY 1, 2, 3""".stripMargin,

// Same moment pivot, same fixed float order as the Spark side.
    "q165_welch" ->
      """WITH ev AS (
        |  SELECT event_type AS stratum,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g,
        |    CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |m AS (
        |  SELECT stratum, g, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
        |    SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS ss
        |  FROM ev GROUP BY 1, 2),
        |p AS (
        |  SELECT stratum,
        |    MAX(CASE WHEN g = 'a' THEN n END) AS n_a,
        |    MAX(CASE WHEN g = 'a' THEN s END) AS s_a,
        |    MAX(CASE WHEN g = 'a' THEN ss END) AS ss_a,
        |    MAX(CASE WHEN g = 'b' THEN n END) AS n_b,
        |    MAX(CASE WHEN g = 'b' THEN s END) AS s_b,
        |    MAX(CASE WHEN g = 'b' THEN ss END) AS ss_b
        |  FROM m GROUP BY stratum)
        |SELECT stratum, n_a, n_b,
        |  CAST(round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000) AS BIGINT)
        |    AS mean_diff_micro,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
        |    CAST(round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt(((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
        |               / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        |            / CAST(n_a AS DOUBLE)
        |          + ((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
        |               / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
        |            / CAST(n_b AS DOUBLE)) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM p WHERE n_a IS NOT NULL AND n_b IS NOT NULL
        |ORDER BY stratum""".stripMargin,

// NOT EXISTS dominance ground truth for the window skyline.
    "q166_skyline" ->
      """WITH p AS (
        |  SELECT p_brand, p_partkey, p_size,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        |  FROM part)
        |SELECT p_brand, p_partkey, price_cents, p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.p_brand = a.p_brand
        |    AND b.price_cents <= a.price_cents AND b.p_size <= a.p_size
        |    AND (b.price_cents < a.price_cents OR b.p_size < a.p_size))
        |ORDER BY p_brand, p_partkey""".stripMargin,

// list_reduce replays the (e + x) // 2 fold in ts order; values
    // are non-negative so // (floor) == Spark's div (trunc).
    "q167_ewma" ->
      """SELECT user_id, COUNT(*) AS n,
        |  list_reduce(list(CAST(round(value * 1000) AS BIGINT) ORDER BY ts),
        |              (a, b) -> (a + b) // 2) AS ewma_milli
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

// The basket cap replayed as a QUALIFY (q17 lesson: cap in query
    // AND oracle, key-for-key); no-op on this data, same predicate.
    "q168_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |capped AS (
        |  SELECT * FROM it QUALIFY COUNT(*) OVER (PARTITION BY b) <= 1000),
        |nb AS (SELECT COUNT(DISTINCT b) AS n FROM capped),
        |pairs AS (
        |  SELECT a.i AS item_a, c.i AS item_b, COUNT(*) AS n_ab
        |  FROM capped a JOIN capped c ON a.b = c.b AND a.i < c.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |supp AS (SELECT i, COUNT(*) AS n_i FROM capped GROUP BY 1)
        |SELECT item_a, item_b, n_ab, sa.n_i AS n_a, sb.n_i AS n_b,
        |  CAST(round(CAST(n_ab AS DOUBLE) / CAST(sa.n_i AS DOUBLE) * 1e6)
        |       AS BIGINT) AS conf_ab_micro,
        |  CAST(round(CAST(n_ab AS DOUBLE) / CAST(sb.n_i AS DOUBLE) * 1e6)
        |       AS BIGINT) AS conf_ba_micro,
        |  CAST(round(CAST(n_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |    / (CAST(sa.n_i AS DOUBLE) * CAST(sb.n_i AS DOUBLE)) * 1e6)
        |       AS BIGINT) AS lift_micro
        |FROM pairs
        |JOIN supp sa ON sa.i = item_a
        |JOIN supp sb ON sb.i = item_b
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin,

// Expected micros interpolated from the SAME driver-side constants
    // the Spark operator embeds — no cross-engine log10 ever runs.
    "q169_benford" -> {
      val exp = operators.Stats.benfordExpectedMicro.toSeq.sorted
        .map { case (d, m) => s"($d, $m)" }.mkString(", ")
      s"""WITH src AS (
         |  SELECT o_orderpriority AS key,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
         |pos AS (SELECT key, CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |        FROM src WHERE cents > 0),
         |counts AS (SELECT key, digit, CAST(COUNT(*) AS BIGINT) AS n_d
         |           FROM pos GROUP BY 1, 2),
         |totals AS (SELECT key, CAST(SUM(n_d) AS BIGINT) AS n FROM counts GROUP BY 1),
         |expd(digit, exp_micro) AS (VALUES $exp),
         |grid AS (SELECT t.key, e.digit, t.n, CAST(e.exp_micro AS BIGINT) AS exp_micro
         |         FROM totals t CROSS JOIN expd e)
         |SELECT g.key, g.digit, CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d, g.n,
         |  CAST(round(1e6 * CAST(COALESCE(c.n_d, 0) AS DOUBLE) / CAST(g.n AS DOUBLE))
         |       AS BIGINT) AS obs_micro,
         |  g.exp_micro,
         |  CAST(round(1e6 * CAST(COALESCE(c.n_d, 0) AS DOUBLE) / CAST(g.n AS DOUBLE))
         |       AS BIGINT) - g.exp_micro AS dev_micro
         |FROM grid g LEFT JOIN counts c USING (key, digit)
         |ORDER BY key, digit""".stripMargin
    },

// The KS argmax runs in exact integer cross-products (HUGEINT in
    // DuckDB, DECIMAL(38,0) in Spark); ONE float division at the end.
    "q170_ks_drift" ->
      """WITH src AS (
        |  SELECT o_orderpriority AS stratum, o_orderstatus AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderstatus IN ('O', 'F')),
        |c AS (SELECT stratum, v,
        |        SUM(CASE WHEN g = 'O' THEN 1 ELSE 0 END) AS ca,
        |        SUM(CASE WHEN g = 'F' THEN 1 ELSE 0 END) AS cb
        |      FROM src GROUP BY 1, 2),
        |cum AS (SELECT stratum,
        |         SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
        |        FROM c WINDOW w AS (PARTITION BY stratum ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT stratum, CAST(SUM(ca) AS BIGINT) AS n_a,
        |          CAST(SUM(cb) AS BIGINT) AS n_b FROM c GROUP BY 1)
        |SELECT t.stratum, t.n_a, t.n_b,
        |  CAST(round(1e6 * CAST(MAX(ABS(cuma * t.n_b - cumb * t.n_a)) AS DOUBLE)
        |    / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE))) AS BIGINT) AS d_micro
        |FROM cum JOIN tot t USING (stratum)
        |WHERE t.n_a > 0 AND t.n_b > 0
        |GROUP BY t.stratum, t.n_a, t.n_b
        |ORDER BY t.stratum""".stripMargin,

"q171_top_paths" ->
      """WITH p AS (
        |  SELECT event_type AS p1,
        |    LEAD(event_type, 1) OVER w AS p2,
        |    LEAD(event_type, 2) OVER w AS p3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |c AS (SELECT p1, p2, p3, COUNT(*) AS n FROM p
        |      WHERE p3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT p1, p2, p3, n FROM c
        |ORDER BY n DESC, p1, p2, p3 LIMIT 25""".stripMargin,

// Shard merge is cell-wise addition, so the two-shard store must
    // answer exactly as one pass over all orders; the ceil-rank
    // (a + b−1) div b idiom is portable on non-negative numerators.
    "q173_hist_store" ->
      """WITH src AS (
        |  SELECT o_orderpriority AS key,
        |    LEAST(GREATEST((CAST(round(o_totalprice * 100) AS BIGINT) - 0) // 500000, 0), 63) AS bin
        |  FROM orders),
        |cells AS (SELECT key, bin, CAST(COUNT(*) AS BIGINT) AS n
        |          FROM src GROUP BY 1, 2),
        |cum AS (SELECT key, bin,
        |         SUM(n) OVER (PARTITION BY key ORDER BY bin
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |        FROM cells),
        |tot AS (SELECT key, CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY 1),
        |qs(q_micro) AS (VALUES (250000), (500000), (900000), (990000)),
        |r AS (SELECT t.key, q.q_micro, t.n,
        |        LEAST(GREATEST((q.q_micro * t.n + 999999) // 1000000, 1), t.n) AS rank
        |      FROM tot t CROSS JOIN qs q)
        |SELECT r.key, CAST(r.q_micro AS BIGINT) AS q_micro, r.n,
        |  CAST(MIN(c.bin) AS BIGINT) AS bin,
        |  CAST(0 + MIN(c.bin) * 500000 AS BIGINT) AS value_edge
        |FROM r JOIN cum c ON c.key = r.key AND c.cum >= r.rank
        |GROUP BY r.key, r.q_micro, r.n
        |ORDER BY r.key, q_micro""".stripMargin,

// Replays the whole MDRM normalization chain the Spark side runs
    // over the synthesized export: snake-cased headers land as these
    // column names, the 12/31/9999 end date is the open-ended NULL
    // (surfaced as end_open to keep gate dtypes non-null), dates parse
    // M/d/yyyy, and the case pipeline (sentence case → U.S. → FFIEC →
    // Tier 1) resolves to a closed form over the lowercase p_name.
    "q175_mdrm_dict" ->
      """WITH b AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name AS nm,
        |    'RCON' || lpad(CAST(p_partkey AS VARCHAR), 5, '0') AS item
        |  FROM part)
        |SELECT item, 'RCON' AS mnemonic,
        |  lpad(CAST(k AS VARCHAR), 5, '0') AS item_code,
        |  'U.S. ' || nm || ' FFIEC Tier 1' AS item_name,
        |  CASE CAST(k % 3 AS INT) WHEN 0 THEN 'integer'
        |    WHEN 1 THEN 'string' ELSE 'date' END AS data_type,
        |  'FFIEC 031' AS reporting_form,
        |  CASE WHEN k % 2 = 0 THEN 'Y' ELSE 'N' END AS confidentiality,
        |  'Loans, net of ' || nm AS description,
        |  CASE WHEN k % 3 = 0 THEN 'F' ELSE 'D' END AS itemtype,
        |  make_date(CAST(2000 + k % 20 AS INT), CAST(k % 12 + 1 AS INT),
        |    CAST(k % 28 + 1 AS INT)) AS start_date,
        |  CAST(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS end_open,
        |  CASE WHEN k % 2 = 0 THEN DATE '1900-01-01'
        |    ELSE DATE '2010-06-30' END AS end_date_f
        |FROM b ORDER BY item""".stripMargin,

// Naive token-inverted self-join — the prefix filter being
    // LOSSLESS means the exhaustive answer is the oracle.
    "q176_set_sim_join" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, lower(t) AS token
        |  FROM documents, UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x <> '')) AS u(t)
        |  WHERE doc_id % 3 = 0),
        |sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY 1),
        |pair AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, sa.s AS size_a, sb.s AS size_b,
        |  CAST(inter AS BIGINT) AS inter,
        |  CAST((inter * 1000000) // (sa.s + sb.s - inter) AS BIGINT) AS jacc_micro
        |FROM pair JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |WHERE inter * 1000000 >= 700000 * (sa.s + sb.s - inter)
        |ORDER BY id_a, id_b""".stripMargin,

"q177_fd_violations" ->
      """SELECT l_orderkey, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_returnflag) AS n_distinct_rhs,
        |  CAST(MIN(l_returnflag) AS VARCHAR) AS rhs_min,
        |  CAST(MAX(l_returnflag) AS VARCHAR) AS rhs_max
        |FROM lineitem
        |GROUP BY 1 HAVING COUNT(DISTINCT l_returnflag) > 1
        |ORDER BY l_orderkey""".stripMargin,

// 0-based pos replays zipWithIndex; the band join is a non-equi
    // range join DuckDB handles via IEJoin at oracle scale.
    "q178_sorted_neighborhood" ->
      """WITH k AS (
        |  SELECT c_custkey AS id,
        |    c_mktsegment || lpad(CAST(CAST(floor(c_acctbal) + 1000 AS BIGINT)
        |      AS VARCHAR), 5, '0') AS k
        |  FROM customer),
        |r AS (SELECT id, k,
        |        row_number() OVER (ORDER BY k, id) - 1 AS pos FROM k)
        |SELECT a.id AS id_a, b.id AS id_b, a.k AS key_a, b.k AS key_b,
        |  CAST(a.pos AS BIGINT) AS pos_a, CAST(b.pos AS BIGINT) AS pos_b,
        |  CAST(b.pos - a.pos AS BIGINT) AS gap
        |FROM r a JOIN r b ON b.pos - a.pos BETWEEN 1 AND 3
        |ORDER BY pos_a, pos_b""".stripMargin,

// Descending row_number ranks (score DESC, id ASC) replay
    // rankNormalize-over-negated-score; rrf terms are integer
    // divisions so the sum is exact.
    "q179_rrf_fuse" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC,
        |          doc_id) AS BIGINT) AS rank_n_chars,
        |        CAST(row_number() OVER (ORDER BY CAST(n_tok AS DOUBLE) DESC,
        |          doc_id) AS BIGINT) AS rank_n_tok
        |      FROM t)
        |SELECT doc_id, rank_n_chars, rank_n_tok,
        |  CAST(1000000 // (60 + rank_n_chars)
        |     + 1000000 // (60 + rank_n_tok) AS BIGINT) AS rrf_micro
        |FROM r ORDER BY doc_id""".stripMargin,

// Strict adjacent bigrams (docs with < 2 tokens contribute none);
    // the KN float formula replays Spark's fixed operation order.
    "q180_kn_bigram" ->
      s"""WITH toks AS (
         |  SELECT list_filter(string_split($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[i] || ' ' || tk[i+1])) AS bigram
         |  FROM toks WHERE len(tk) >= 2),
         |c AS (SELECT split_part(bigram, ' ', 1) AS w1,
         |        split_part(bigram, ' ', 2) AS w2, COUNT(*) AS c12
         |      FROM bg GROUP BY 1, 2),
         |l AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |        COUNT(*) AS n1p FROM c GROUP BY 1),
         |r AS (SELECT w2, COUNT(*) AS ncont FROM c GROUP BY 1),
         |d AS (SELECT COUNT(*) AS d FROM c)
         |SELECT w1, w2, c12, c1, n1p, ncont,
         |  CAST(round(1e6 * ((CAST(c12 AS DOUBLE) - 0.5) / CAST(c1 AS DOUBLE)
         |    + (CAST(n1p AS DOUBLE) / (2.0 * CAST(c1 AS DOUBLE)))
         |      * (CAST(ncont AS DOUBLE) / CAST(d AS DOUBLE)))) AS BIGINT)
         |    AS p_micro
         |FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN d
         |WHERE c12 >= 5 ORDER BY w1, w2""".stripMargin,

// Type-1 percentiles from distinct-value cumulative counts —
    // the operator's exact rank bounds in the same integer micros.
    "q181_winsorize" ->
      """WITH rowsrc AS (
        |  SELECT source AS key, doc_id AS id, CAST(n_chars AS BIGINT) AS x
        |  FROM documents),
        |g AS (SELECT key, x, COUNT(*) AS c FROM rowsrc
        |      WHERE x IS NOT NULL GROUP BY 1, 2),
        |cumt AS (SELECT key, x,
        |           SUM(c) OVER (PARTITION BY key ORDER BY x) AS cum,
        |           SUM(c) OVER (PARTITION BY key) AS n
        |         FROM g),
        |th AS (SELECT key,
        |         MIN(CASE WHEN cum >= greatest(1, (n * 50000 + 999999) // 1000000)
        |             THEN x END) AS x_lo,
        |         MIN(CASE WHEN cum >= greatest(1, (n * 950000 + 999999) // 1000000)
        |             THEN x END) AS x_hi
        |       FROM cumt GROUP BY 1)
        |SELECT key, id, x, x_lo, x_hi,
        |  CASE WHEN x IS NULL THEN NULL
        |       ELSE least(greatest(x, x_lo), x_hi) END AS x_wins
        |FROM rowsrc JOIN th USING (key)
        |ORDER BY key, id""".stripMargin,

// Positional double-unnest (generate_subscripts) replays the
    // posexplode pair loop; HUGEINT products sum exactly.
    "q183_gram_matrix" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
        |      AS vi
        |  FROM embeddings)
        |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |  CAST(SUM(CAST(a.vi AS HUGEINT) * b.vi) AS BIGINT) AS g
        |FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
        |GROUP BY 1, 2 ORDER BY i, j""".stripMargin,

// The float term replays Spark's left-assoc (1e6 * pa) * ln(pa/pb)
    // with pa/pb in the identical (c+1)/(N+V) order.
    "q184_categorical_kl" ->
      """WITH ca AS (SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS c_a
        |            FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |cb AS (SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS c_b
        |       FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT v, CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
        |        CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
        |      FROM ca FULL JOIN cb USING (v)),
        |t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS na,
        |        CAST(SUM(c_b) AS BIGINT) AS nb, COUNT(*) AS vc FROM j)
        |SELECT v, c_a, c_b,
        |  CAST(round(1e6
        |    * ((CAST(c_a AS DOUBLE) + 1.0) / CAST(na + vc AS DOUBLE))
        |    * ln(((CAST(c_a AS DOUBLE) + 1.0) / CAST(na + vc AS DOUBLE))
        |       / ((CAST(c_b AS DOUBLE) + 1.0) / CAST(nb + vc AS DOUBLE))))
        |    AS BIGINT) AS kl_term_micro
        |FROM j CROSS JOIN t ORDER BY v""".stripMargin,

// Both ranks are exact row_numbers over the same (x, id) total
    // order; the target-rank bridge is pure long arithmetic.
    "q185_quantile_normalize" ->
      """WITH rowsrc AS (
        |  SELECT source AS key, doc_id AS id, CAST(n_chars AS BIGINT) AS x
        |  FROM documents WHERE n_chars IS NOT NULL),
        |r AS (SELECT key, id, x,
        |        CAST(row_number() OVER (PARTITION BY key ORDER BY x, id)
        |          AS BIGINT) AS r,
        |        CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_k,
        |        CAST(COUNT(*) OVER () AS BIGINT) AS n
        |      FROM rowsrc),
        |g AS (SELECT x AS gx,
        |        CAST(row_number() OVER (ORDER BY x, id) AS BIGINT) AS gpos
        |      FROM rowsrc)
        |SELECT key, id, x, r, n_k, gx AS x_norm
        |FROM r JOIN g ON (r * n + n_k - 1) // n_k = gpos
        |ORDER BY key, id""".stripMargin,

// Exhaustive quadratic self-join — the lossless-ness check the
    // deletion-neighborhood join is graded against. DuckDB's
    // levenshtein is the same unit-cost edit distance as Spark's.
    "q186_editdist_pairs" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |           WHERE c_nationkey < 5)
        |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  a.c_name AS s_a, b.c_name AS s_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

// Mode tie-break: highest count, then smallest value — both
    // sides pick via the same max-count filter + MIN.
    "q187_golden_record" ->
      """WITH base AS (SELECT c_nationkey AS cluster, c_acctbal, c_name,
        |                c_mktsegment FROM customer),
        |agg AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_records,
        |          MAX(c_acctbal) AS c_acctbal_max, MIN(c_name) AS c_name_min
        |        FROM base GROUP BY 1),
        |cnt AS (SELECT cluster, c_mktsegment AS v, COUNT(*) AS cnt
        |        FROM base WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
        |best AS (SELECT cluster, MAX(cnt) AS top FROM cnt GROUP BY 1),
        |pick AS (SELECT cluster, MIN(v) AS c_mktsegment_mode
        |         FROM cnt JOIN best USING (cluster) WHERE cnt = top
        |         GROUP BY 1)
        |SELECT cluster, n_records, c_acctbal_max, c_name_min,
        |  c_mktsegment_mode
        |FROM agg LEFT JOIN pick USING (cluster)
        |ORDER BY cluster""".stripMargin,

// Half-unit rank sums over distinct-value counts; the z replays
    // Spark's fixed float order incl. the ±1 continuity correction
    // (2U units).
    "q188_mann_whitney" ->
      """WITH rowsrc AS (
        |  SELECT lang AS stratum,
        |    CASE WHEN source = 'src0' THEN 'a' ELSE 'b' END AS g,
        |    CAST(n_chars AS BIGINT) AS x
        |  FROM documents
        |  WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL),
        |grp AS (SELECT stratum, x,
        |          SUM(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
        |          SUM(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
        |        FROM rowsrc GROUP BY 1, 2),
        |cum AS (SELECT stratum, x, ca, cb, ca + cb AS c,
        |          COALESCE(SUM(ca + cb) OVER (PARTITION BY stratum ORDER BY x
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        |        FROM grp),
        |agg AS (SELECT stratum, CAST(SUM(ca) AS BIGINT) AS n_a,
        |          CAST(SUM(cb) AS BIGINT) AS n_b,
        |          CAST(SUM(CAST(ca AS HUGEINT) * (2 * o + c + 1)) AS BIGINT)
        |            AS r2_a,
        |          SUM(CAST(c AS HUGEINT) * c * c - c) AS ties
        |        FROM cum GROUP BY 1),
        |u AS (SELECT stratum, n_a, n_b, r2_a,
        |        CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
        |        n_a + n_b AS n, ties
        |      FROM agg),
        |f AS (SELECT *,
        |        CAST(u2_a AS DOUBLE)
        |          - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS diff,
        |        (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 3.0)
        |          * ((CAST(n AS DOUBLE) + 1.0)
        |            - CAST(ties AS DOUBLE)
        |              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |          AS s2
        |      FROM u)
        |SELECT stratum, n_a, n_b, r2_a, u2_a,
        |  CASE WHEN n_a >= 1 AND n_b >= 1 AND n >= 2 AND s2 > 0
        |    THEN CAST(round((CASE WHEN diff > 0 THEN diff - 1.0
        |                          WHEN diff < 0 THEN diff + 1.0
        |                          ELSE 0.0 END / sqrt(s2)) * 1e6) AS BIGINT)
        |  END AS z_micro
        |FROM f ORDER BY stratum""".stripMargin,

// DuckDB ASOF joins replay both linear merges (pred on x, succ on
    // the negated axis); tie-low pick in the same CASE order.
    "q189_nn_match" ->
      """WITH a AS (SELECT lang AS stratum, doc_id AS id,
        |             CAST(n_chars AS BIGINT) AS x
        |           FROM documents
        |           WHERE source = 'src0' AND n_chars IS NOT NULL),
        |b AS (SELECT lang AS stratum, CAST(n_chars AS BIGINT) AS bx
        |      FROM documents
        |      WHERE source = 'src1' AND n_chars IS NOT NULL),
        |p AS (SELECT a.stratum, a.id, a.x, b.bx AS x_lo
        |      FROM a ASOF LEFT JOIN b
        |        ON a.stratum = b.stratum AND b.bx <= a.x),
        |nb AS (SELECT stratum, -bx AS nbx, bx FROM b),
        |na AS (SELECT stratum, id, -x AS nx FROM a),
        |s AS (SELECT na.stratum, na.id, nb.bx AS x_hi
        |      FROM na ASOF LEFT JOIN nb
        |        ON na.stratum = nb.stratum AND nb.nbx <= na.nx),
        |m AS (SELECT stratum, id, x,
        |        CASE WHEN x_lo IS NULL THEN x_hi
        |             WHEN x_hi IS NULL THEN x_lo
        |             WHEN x - x_lo <= x_hi - x THEN x_lo
        |             ELSE x_hi END AS x_match
        |      FROM p JOIN s USING (stratum, id))
        |SELECT stratum, id, x, x_match, ABS(x - x_match) AS gap
        |FROM m ORDER BY stratum, id""".stripMargin,

// Closed-form ground truth: after the mod-6 chains, the mod-3
    // chains, and the (1,2) bridge, components are {≡0 mod 3} (rep 3
    // — id 0 never appears in any k>6 / k>3 edge) and {≡1 ∪ ≡2 mod 3}
    // (rep 1); ids 1..max all appear as edge endpoints.
    "q191_cc_store" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CAST(CASE WHEN c_custkey % 3 = 0 THEN 3 ELSE 1 END AS BIGINT)
        |    AS rep
        |FROM customer WHERE c_custkey >= 1 AND c_custkey < 2000
        |ORDER BY id""".stripMargin,

// 3×3 Cramer replay: HUGEINT moments, the identical cofactor
    // expansion order, DuckDB dow+1 == Spark dayofweek.
    "q196_ols2" ->
      """WITH e AS (
        |  SELECT event_type AS key, CAST(hour(ts) AS BIGINT) AS x1,
        |    CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS x2,
        |    CAST(round(value * 1000) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
        |        CAST(SUM(y) AS BIGINT) AS sy,
        |        SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
        |        SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
        |        SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
        |        SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
        |        SUM(CAST(x2 AS HUGEINT) * y) AS s2y
        |      FROM e GROUP BY 1),
        |f AS (SELECT key, n,
        |        CAST(n AS DOUBLE) AS an, CAST(s1 AS DOUBLE) AS a12,
        |        CAST(s2 AS DOUBLE) AS a13, CAST(s11 AS DOUBLE) AS a22,
        |        CAST(s12 AS DOUBLE) AS a23, CAST(s22 AS DOUBLE) AS a33,
        |        CAST(sy AS DOUBLE) AS r1, CAST(s1y AS DOUBLE) AS r2,
        |        CAST(s2y AS DOUBLE) AS r3
        |      FROM m),
        |dets AS (SELECT key, n,
        |    an*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
        |      + a13*(a12*a23 - a22*a13) AS det,
        |    r1*(a22*a33 - a23*a23) - a12*(r2*a33 - a23*r3)
        |      + a13*(r2*a23 - a22*r3) AS det0,
        |    an*(r2*a33 - r3*a23) - r1*(a12*a33 - a23*a13)
        |      + a13*(a12*r3 - r2*a13) AS det1,
        |    an*(a22*r3 - a23*r2) - a12*(a12*r3 - r2*a13)
        |      + r1*(a12*a23 - a22*a13) AS det2,
        |    abs(an*a22*a33) + 1.0 AS scale_ref
        |  FROM f)
        |SELECT key, n,
        |  CASE WHEN n >= 3 AND abs(det) > scale_ref * 1e-9
        |    THEN CAST(round(det0 / det * 1e6) AS BIGINT) END AS b0_micro,
        |  CASE WHEN n >= 3 AND abs(det) > scale_ref * 1e-9
        |    THEN CAST(round(det1 / det * 1e6) AS BIGINT) END AS b1_micro,
        |  CASE WHEN n >= 3 AND abs(det) > scale_ref * 1e-9
        |    THEN CAST(round(det2 / det * 1e6) AS BIGINT) END AS b2_micro
        |FROM dets ORDER BY key""".stripMargin,

// Group moments exact; the s²/n ratio is quantized to micros per
    // group BEFORE the stratum sum (order-independent), F replays
    // Spark's fixed float order.
    "q197_anova" ->
      """WITH g AS (
        |  SELECT lang AS stratum, source AS grp,
        |    CAST(COUNT(*) AS BIGINT) AS ng,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sg,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS ssg
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |q AS (SELECT stratum, ng, sg, ssg,
        |        CAST(round((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |          / CAST(ng AS DOUBLE)) * 1e6) AS HUGEINT) AS rq6
        |      FROM g),
        |a AS (SELECT stratum, CAST(SUM(ng) AS BIGINT) AS n,
        |        CAST(COUNT(*) AS BIGINT) AS k,
        |        CAST(SUM(sg) AS BIGINT) AS s, SUM(ssg) AS ss,
        |        SUM(rq6) AS rq6
        |      FROM q GROUP BY 1),
        |f AS (SELECT stratum, n, k,
        |        CAST(rq6 AS DOUBLE) / 1e6
        |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |            / CAST(n AS DOUBLE) AS ssb,
        |        CAST(ss AS DOUBLE) - CAST(rq6 AS DOUBLE) / 1e6 AS ssw
        |      FROM a)
        |SELECT stratum, n, k,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0
        |    THEN CAST(round((ssb / (CAST(k AS DOUBLE) - 1.0))
        |      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6)
        |      AS BIGINT) END AS f_micro
        |FROM f ORDER BY stratum""".stripMargin,

// Exact desc ranks over distinct-score runs (oracle may window
    // freely — the operator's two-phase ranks are the same integers),
    // integer slice cuts, HUGEINT-safe lift micros.
    "q198_lift" ->
      """WITH rowsrc AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS x,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
        |        CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS p
        |      FROM rowsrc GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tot,
        |        CAST(SUM(p) AS BIGINT) AS p_tot FROM g),
        |o AS (SELECT x, c, p,
        |        COALESCE(SUM(c) OVER (ORDER BY x DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        |      FROM g),
        |s AS (SELECT (o * 10) // n_tot AS slice, SUM(c) AS n, SUM(p) AS pos
        |      FROM o CROSS JOIN t GROUP BY 1),
        |cumt AS (SELECT slice, CAST(n AS BIGINT) AS n,
        |           CAST(pos AS BIGINT) AS pos,
        |           CAST(SUM(n) OVER (ORDER BY slice) AS BIGINT) AS cum_n,
        |           CAST(SUM(pos) OVER (ORDER BY slice) AS BIGINT) AS cum_pos
        |         FROM s)
        |SELECT CAST(slice AS BIGINT) AS slice, n, pos, cum_n, cum_pos,
        |  CASE WHEN p_tot > 0 THEN
        |    CAST((CAST(cum_pos AS HUGEINT) * n_tot * 1000000)
        |      // (CAST(cum_n AS HUGEINT) * p_tot) AS BIGINT) END AS lift_micro
        |FROM cumt CROSS JOIN t ORDER BY slice""".stripMargin,

// The (c_ab/N)·ln(c_ab·N/(c_a·c_b)) term in the identical float
    // order over identical exact counts.
    "q199_mutual_info" ->
      """WITH cells AS (
        |  SELECT CAST(source AS VARCHAR) AS a, CAST(lang AS VARCHAR) AS b,
        |    CAST(COUNT(*) AS BIGINT) AS c_ab
        |  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |ma AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cells GROUP BY 1),
        |mb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n FROM cells)
        |SELECT a, b, c_ab, c_a, c_b, n,
        |  CAST(round((CAST(c_ab AS DOUBLE) / CAST(n AS DOUBLE))
        |    * ln(CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE)
        |      / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS mi_term_micro
        |FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN t
        |ORDER BY a, b""".stripMargin,

// Peel fixpoint in closed form: only the 8-clique survives k = 3,
    // in-core degree 7 for every member.
    "q194_kcore" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id, CAST(7 AS BIGINT) AS degree
        |FROM customer WHERE c_custkey < 8 ORDER BY id""".stripMargin,

// Chain hops in closed form: dist = id div 300 (sources < 300 at
    // 0); every id below the cap is reachable.
    "q195_bfs" ->
      """SELECT CAST(c_custkey AS BIGINT) AS id,
        |  CAST(c_custkey // 300 AS BIGINT) AS dist
        |FROM customer WHERE c_custkey < 3000 ORDER BY id""".stripMargin,

// Exhaustive shared-token join (lossless for τ > 0 since a
    // qualifying pair shares ≥ 1 token); the integer verify and the
    // floor-over-IEEE-sqrt cos replay the operator bit-for-bit.
    "q192_cosine_pairs" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, lower(t) AS token
        |  FROM documents, UNNEST(list_filter(string_split_regex(trim(text), '\s+'),
        |    x -> x <> '')) AS u(t)
        |  WHERE doc_id % 3 = 1),
        |sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY 1),
        |pair AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, sa.s AS size_a, sb.s AS size_b,
        |  CAST(inter AS BIGINT) AS inter,
        |  CAST(FLOOR(CAST(inter AS DOUBLE) * 1000000
        |    / sqrt(CAST(sa.s * sb.s AS DOUBLE))) AS BIGINT) AS cos_micro
        |FROM pair JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS HUGEINT) * inter * 1000000000000
        |  >= CAST(360000000000 AS HUGEINT) * sa.s * sb.s
        |ORDER BY id_a, id_b""".stripMargin,

// Integer bin arithmetic replayed with the same clamp (floor-vs-
    // truncate div differences die in the GREATEST(0)); -1 sentinel
    // for empty bins per the comparator dtype contract.
    "q193_calibration" ->
      """WITH ev AS (
        |  SELECT CAST(round(value * 1000) AS BIGINT) AS v,
        |    (event_type = 'purchase') AS y
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT LEAST(GREATEST((v * 10) // 100000, 0), 9) AS bin,
        |        CAST(y AS BIGINT) AS y
        |      FROM ev),
        |c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(y) AS BIGINT) AS pos
        |      FROM b GROUP BY 1),
        |spine AS (SELECT unnest(range(0, 10)) AS bin)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(bin * 10000 AS BIGINT) AS lo_milli,
        |  CAST((bin + 1) * 10000 AS BIGINT) AS hi_milli,
        |  COALESCE(n, 0) AS n, COALESCE(pos, 0) AS pos,
        |  COALESCE((pos * 1000000) // n, -1) AS rate_micro
        |FROM spine LEFT JOIN c USING (bin) ORDER BY bin""".stripMargin,

// The (d, d+1) pair join and the exact HUGEINT moments; r_micro
    // replays Spark's (cov/sqrt(vx*vy))*1e6 order.
    "q190_autocorr" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS d,
        |                 CAST(COUNT(*) AS BIGINT) AS v
        |               FROM events GROUP BY 1, 2),
        |pairs AS (SELECT a.key, a.v AS x, b.v AS y
        |          FROM daily a JOIN daily b
        |            ON a.key = b.key AND b.d = a.d + 1),
        |m AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS np,
        |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |        SUM(CAST(y AS HUGEINT) * y) AS syy
        |      FROM pairs GROUP BY 1),
        |f AS (SELECT key, np,
        |        CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(np AS DOUBLE) AS cov,
        |        CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |          / CAST(np AS DOUBLE) AS vx,
        |        CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |          / CAST(np AS DOUBLE) AS vy
        |      FROM m)
        |SELECT key, np AS n_pairs,
        |  CASE WHEN np >= 2 AND vx > 0 AND vy > 0
        |    THEN CAST(round(cov / sqrt(vx * vy) * 1e6) AS BIGINT)
        |  END AS r_micro
        |FROM f ORDER BY key""".stripMargin,

// HUGEINT floor-division replays Spark's DECIMAL(38,0) `div`.
    "q182_chi2_cells" ->
      """WITH c AS (SELECT source AS a, lang AS b, COUNT(*) AS o
        |           FROM documents GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS row_total FROM c GROUP BY 1),
        |ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS col_total FROM c GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c)
        |SELECT a, b, o, row_total, col_total,
        |  CAST((CAST(row_total AS HUGEINT) * col_total * 1000000) // n
        |    AS BIGINT) AS e_micro,
        |  CAST(((CAST(o AS HUGEINT) * n - CAST(row_total AS HUGEINT) * col_total)
        |      * (CAST(o AS HUGEINT) * n - CAST(row_total AS HUGEINT) * col_total)
        |      * 1000000)
        |    // (CAST(row_total AS HUGEINT) * col_total * n) AS BIGINT)
        |    AS contrib_micro
        |FROM c JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN n
        |ORDER BY a, b""".stripMargin,

"q172_readability" ->
      """SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(round(1e6 * (206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
        |    AS BIGINT) AS flesch_micro
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_words,
        |    GREATEST(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        |  FROM documents WHERE doc_id % 7 = 2) x
        |WHERE n_words > 0
        |ORDER BY doc_id""".stripMargin)
}
