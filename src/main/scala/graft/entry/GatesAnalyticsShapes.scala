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

/** Gate registry, corpus analytics, rounds 7-8 (keys, agreement,
  * graph/stat shapes) — split verbatim out of SparkEntry.scala
  * (round 10, r9 verdict ask #8). Round 14: the 18 TPC-H planner
  * shapes moved verbatim to [[GatesTpch]] (registry growth watch:
  * Shapes was at 2,318 lines; zero behavior change).
  */
private[graft] object GatesAnalyticsShapes {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

// Margin-criterion neighbor mining (Artetxe & Schwenk 2019) over
    // the approximate kNN graph: hubness-corrected cosine. Exact
    // integer-micro neighborhood sums; one fixed-order float close.
    "q252_margin_pairs" -> ((s, dir) => {
      Knn.marginPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, c = 16, nprobe = 2, portableHash = true)
        .orderBy("query_id", "rank")
    }),

// Tokenizer fertility per language — pieces-per-word with the
    // RE2-portable piece regex; the per-language token-budget signal.
    "q253_fertility" -> ((s, dir) => {
      operators.TextAnalytics.tokenizerFertility(
        t(s, dir, "documents"), "lang", "text")
        .orderBy("key")
    }),

// Per-domain boilerplate removal (CCNet/RefinedWeb step): two
    // injected chrome lines per synthetic domain must vanish from
    // every doc of that domain, organic lines survive.
    "q254_domain_boilerplate" -> ((s, dir) => {
      val dom = pmod(col("doc_id"), lit(12)).cast("string")
      val synth = t(s, dir, "documents").select(col("doc_id"),
        dom.as("dom"),
        concat(lit("NAV home about contact dom="), dom, lit("\n"),
          col("text"), lit("\nCopyright dom="), dom).as("raw"))
      Dedup.removeDomainBoilerplate(synth, "doc_id", "dom", "raw",
        minShare = 0.6, minDocs = 3)
        .orderBy("doc_id")
    }),

// One-pass pairwise-complete Pearson correlation matrix over the
    // integer-quantized lineitem measures.
    "q255_corr_matrix" -> ((s, dir) => {
      operators.Stats.corrMatrix(
        t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_discount") * 10000).cast("long").as("disc_bp"),
          round(col("l_tax") * 10000).cast("long").as("tax_bp")),
        Seq("qty", "price_c", "disc_bp", "tax_bp"))
        .orderBy("col_a", "col_b")
    }),

// Greedy k-center coreset (farthest-first): 5 diversity-maximal
    // representatives of the embedding table, every pick replayed.
    "q262_kcenter_coreset" -> ((s, dir) => {
      Knn.kCenterCoreset(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5).orderBy("rank")
    }),

// Hard-negative band (DPR recipe): ranks 2..5 of the approximate
    // kNN graph per anchor — rank 1 reserved as presumed-positive.
    "q261_hard_negatives" -> ((s, dir) => {
      Knn.hardNegatives(t(s, dir, "embeddings"), "vec_id", "embedding",
        kLo = 2, kHi = 5, c = 16, nprobe = 2, portableHash = true)
        .orderBy("query_id", "rank")
    }),

// Entropy l-diversity: the homogeneity-attack refinement beside
    // q200's distinct-count check — per (priority, year) group the
    // exact sensitive-status entropy in order-independent micros.
    "q260_entropy_ldiv" -> ((s, dir) => {
      operators.KeyChecks.entropyLDiversity(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).cast("long").as("yr"),
          col("o_orderstatus").as("status")),
        Seq("pri", "yr"), "status", l = 2)
        .orderBy("pri", "yr")
    }),

// HITS hubs/authorities in exact path-count form over the
    // customer→supplier engagement graph; supplier ids negated into
    // their own namespace (the q219 id-collapse lesson).
    "q271_hits" -> ((s, dir) => {
      val e = t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (-col("l_suppkey") - 1).as("dst"))
        .distinct() // classical 0/1 adjacency, not purchase-weighted
      Graph.hitsCounts(e, "src", "dst", rounds = 2).orderBy("node")
    }),

// Adamic–Adar link prediction: supplier pairs sharing customers,
    // promiscuous customers df-capped away, per-neighbor log terms
    // micro-quantized pre-sum.
    "q272_adamic_adar" -> ((s, dir) => {
      val e = t(s, dir, "orders").join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      Graph.adamicAdar(e, "s", "c", maxDeg = 40, minCommon = 2)
        .orderBy("a", "b")
    }),

// Kruskal–Wallis rank test per line status across return-flag
    // groups — integer double-ranks, micro-quantized ratio terms.
    "q273_kruskal_wallis" -> ((s, dir) => {
      operators.Stats.kruskalWallis(t(s, dir, "lineitem"),
        "l_linestatus", "l_returnflag", "l_quantity")
        .orderBy("stratum")
    }),

// Unary inclusion-dependency profile across the star schema: the
    // four real FKs hold; the two reversed/cross probes measure how
    // far containment fails.
    "q274_inclusion_deps" -> ((s, dir) => {
      operators.KeyChecks.inclusionDeps(Seq(
        ("cust_nation_in_nation", t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        ("li_part_in_part", t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        ("li_supp_in_supplier", t(s, dir, "lineitem"), "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"),
        ("ord_cust_in_customer", t(s, dir, "orders"), "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        ("part_in_li_part", t(s, dir, "part"), "p_partkey",
          t(s, dir, "lineitem"), "l_partkey"),
        ("supp_nation_in_cust_nation", t(s, dir, "supplier"),
          "s_nationkey", t(s, dir, "customer"), "c_nationkey")))
        .orderBy("pair")
    }),

// One DoReMi reweighting step over the document domains: initial
    // weights ∝ doc counts, excess loss = relative mean-length
    // deviation, η=2, 10% uniform smoothing.
    "q275_doremi_step" -> ((s, dir) => {
      val g = t(s, dir, "documents").groupBy(col("source").as("domain"))
        .agg(count(lit(1)).as("n"), sum("n_chars").as("sc"))
      val tot = g.agg(sum("n").as("tn"), sum("sc").as("tsc"))
      val avgAll = col("tsc").cast("double") / col("tn").cast("double")
      val d = g.crossJoin(broadcast(tot))
        .select(col("domain"),
          expr("n * 1000000L div tn").as("weight_ppm"),
          round((col("sc").cast("double") / col("n").cast("double") -
            avgAll) / avgAll * 1e6).cast("long").as("loss_micro"))
      Sampling.doremiStep(d, "domain", "weight_ppm", "loss_micro",
        etaMicro = 2000000L, smoothPpm = 100000L)
        .orderBy("domain")
    }),

// Matryoshka truncation audit: recall@5 of the 8-dim prefix
    // retrieval against the full 64-dim exact top-5.
    "q276_matryoshka" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 50 === 0)
      Knn.matryoshkaRecall(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, prefixDims = 8)
        .orderBy("query_id")
    }),

// Cliff's delta: stochastic dominance of R-flag over A-flag
    // quantities per line status, from value cells.
    "q299_cliffs_delta" -> ((s, dir) => {
      operators.Stats.cliffsDelta(t(s, dir, "lineitem"),
        "l_linestatus", "l_returnflag", "R", "A", "l_quantity")
        .orderBy("stratum")
    }),

// Kendall τ-b between quantity and discount basis points, from
    // the 50×11 contingency cells — never row pairs.
    "q298_kendall_tau" -> ((s, dir) => {
      operators.Stats.kendallTauB(
        t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("qty"),
          round(col("l_discount") * 100).cast("long").as("disc_pct")),
        "qty", "disc_pct")
    }),

// g3 approximate-FD error: how far is l_partkey → l_linestatus
    // from holding (min fraction of rows to remove)?
    "q297_fd_error" -> ((s, dir) => {
      operators.KeyChecks.fdError(t(s, dir, "lineitem"),
        Seq("l_partkey"), "l_linestatus")
    }),

// Ljung–Box portmanteau over each event type's daily series:
    // pooled lag-1..4 autocorrelation, white-noise screen.
    "q296_ljung_box" -> ((s, dir) => {
      operators.TimeSeries.ljungBox(events(s, dir), "event_type", "ts",
        maxLag = 4)
        .orderBy("key")
    }),

// Salted skew join: lineitem ⋈ supplier on a salt-composited key,
    // row-identical to the plain join the oracle runs.
    "q295_salted_join" -> ((s, dir) => {
      val j = operators.Joins.saltedJoin(
        t(s, dir, "lineitem").select(col("l_suppkey").as("s_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        "s_suppkey", salts = 8)
      j.groupBy("s_name").agg(count(lit(1)).as("n"),
        sum("cents").as("cents_total"))
        .orderBy("s_name")
    }),

// Split-conformal threshold per priority: the k-th smallest cent
    // total with k = ceil((n+1)·0.9), selected from value cells.
    "q292_conformal" -> ((s, dir) => {
      operators.Stats.conformalThreshold(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "pri", "cents", alphaPpm = 100000L)
        .orderBy("group")
    }),

// Gini–Simpson token diversity per source — the concentration
    // readout beside the entropy family.
    "q293_simpson" -> ((s, dir) => {
      operators.TextAnalytics.simpsonDiversity(t(s, dir, "documents"),
        "source", "text")
        .orderBy("group")
    }),

// Nelson–Aalen cumulative hazard over the q228 survival frame —
    // the additive sibling of Kaplan–Meier on identical cells.
    "q294_nelson_aalen" -> ((s, dir) => {
      val ev = events(s, dir)
      val a = ev.where(col("event_type") === "view")
        .groupBy(col("user_id").as("u"))
        .agg(min(unix_micros(col("ts"))).as("ta"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val conv = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("u"), unix_micros(col("ts")).as("tb"))
        .join(a, Seq("u")).where(col("tb") > col("ta"))
        .groupBy("u", "ta").agg(min("tb").as("tb"))
        .select(col("u"), expr("(tb - ta) div 1000000L").as("t"),
          lit(true).as("e"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val last = ev.groupBy(col("user_id").as("u"))
        .agg(max(unix_micros(col("ts"))).as("tmax"))
      val cens = a.join(last, Seq("u"))
        .join(conv.select(col("u"), lit(1).as("__c")), Seq("u"), "left_anti")
        .select(col("u"), expr("(tmax - ta) div 1000000L").as("t"),
          lit(false).as("e"))
      val subjects = conv.unionByName(cens)
        .withColumn("cohort", concat(lit("c"), pmod(col("u"), lit(2L))))
      operators.Stats.nelsonAalen(subjects, "cohort", "t", "e")
        .orderBy("key", "t")
    }),

// One-pass multi-needle scan (Aho–Corasick): per-doc occurrence
    // counts of five border-free needles — equals the replace-based
    // non-overlapping oracle exactly because the needles are
    // border-free.
    "q290_multi_needle" -> ((s, dir) => {
      TextAnalytics.multiNeedleScan(t(s, dir, "documents"), "doc_id",
        "text", Seq("spark", "batch window", "key agg",
          "customer query", "slow key"))
        .orderBy("doc_id", "needle")
    }),

// Misra–Gries candidates + exact verify pass: bounded-memory
    // heavy hitters whose final top-15 equals the unconstrained
    // exact top-15.
    "q291_heavy_hitters" -> ((s, dir) => {
      TextAnalytics.heavyHitters(t(s, dir, "documents"), "text",
        k = 256, topN = 15)
    }),

// Holt level+trend smoothing (α=β=1/2) per user in exact integer
    // millis — floor-halving via arithmetic shift on both engines.
    "q288_holt" -> ((s, dir) => {
      operators.TimeSeries.holtHalfPerKey(
        events(s, dir).select(col("user_id"), col("ts"),
          round(col("value") * 1000).cast("long").as("milli")),
        "user_id", "ts", "milli")
        .orderBy("user_id")
    }),

// UniMax waterfill of a fixed character budget across sources at
    // maxEpochs=2 — exact integer closed form, crumbs deterministic.
    "q289_unimax" -> ((s, dir) => {
      operators.Sampling.unimaxAllocation(t(s, dir, "documents"),
        "source", "n_chars", budget = 600000L, maxEpochs = 2L)
        .select(col("group").as("grp"), col("n_units"), col("capacity"),
          col("capped"), col("alloc"))
        .orderBy("grp")
    }),

// Benjamini–Hochberg step-up over portable-hash pseudo p-values:
    // the reject set is decided in pure integer arithmetic.
    "q284_bh_fdr" -> ((s, dir) => {
      val tests = t(s, dir, "nation").select(col("n_name").as("test"),
        pmod(graft.functions.Hashes.md5Hash64(col("n_name")),
          lit(1000000L)).as("p_micro"))
      operators.Stats.bhFdr(tests, "test", "p_micro",
        alphaMicro = 200000L)
        .orderBy("rank")
    }),

// Pairwise source-vocabulary overlap: exact intersection/union
    // sizes and integer Jaccard for all 190 source pairs.
    "q285_vocab_overlap" -> ((s, dir) => {
      operators.TextAnalytics.vocabOverlap(t(s, dir, "documents"),
        "source", "text")
        .orderBy("g_a", "g_b")
    }),

// Neyman budget allocation across order priorities by exact
    // integer largest-remainder apportionment of B·N_h·σ_h.
    "q286_neyman" -> ((s, dir) => {
      operators.Sampling.neymanAllocation(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "pri", "cents", budget = 1000L)
        .orderBy("stratum")
    }),

// Cochran–Armitage dose-ordered trend: does the F-status rate
    // drift with the numeric priority level?
    "q287_cochran_armitage" -> ((s, dir) => {
      operators.Stats.cochranArmitage(
        t(s, dir, "orders").select(
          substring(col("o_orderpriority"), 1, 1).cast("long")
            .as("dose"),
          (col("o_orderstatus") === "F").as("success")),
        "dose", "success")
    }),

// Deterministic synchronous label propagation on the symmetrized
    // mod-hub graph: 3 rounds, mode-of-neighbors with the fixed
    // (count desc, label asc) tie-break.
    "q283_label_prop" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
      operators.Graph.labelPropagation(edges, "src", "dst", rounds = 3)
        .orderBy("node")
    }),

// RAKE keyphrases over the corpus: stopword/punct-delimited
    // candidate phrases, degree/frequency word scores, top 25.
    "q282_rake" -> ((s, dir) => {
      operators.TextAnalytics.rakeKeywords(t(s, dir, "documents"), "text",
        Seq("the", "a", "an", "of", "and", "or", "to", "in", "on", "for",
          "with", "is", "are", "was", "be", "as", "at", "by", "it",
          "this", "that", "from"), topN = 25, maxWords = 4)
    }),

// Gap-constrained episode pairs (WINEPI length-2): which event
    // types follow which within 24h of the same user's stream, every
    // in-window occurrence pair counted.
    "q280_episode_pairs" -> ((s, dir) => {
      operators.Sequences.episodePairs(events(s, dir), "user_id", "ts",
        "event_type", gapSeconds = 86400L, minSupport = 10L)
        .orderBy("a", "b")
    }),

// Positional phrase index: exact two-word phrase occurrences via
    // position intersection — must equal the token-scan ground truth.
    "q281_phrase_search" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_pos").toString
      operators.InvertedIndex.writePositional(docs, "doc_id", "text", tmp,
        buckets = 16)
      operators.InvertedIndex.searchPhrase(s, tmp, "table hash")
        .orderBy("doc_id")
    }),

// t-closeness EMD audit per (priority, year) cell over bucketed
    // order totals — the privacy triad's third leg beside q200/q260.
    "q278_tcloseness" -> ((s, dir) => {
      operators.KeyChecks.tCloseness(
        t(s, dir, "orders").select(col("o_orderpriority").as("pri"),
          year(col("o_orderdate")).cast("long").as("yr"),
          floor(col("o_totalprice") / 20000.0).cast("long").as("bucket")),
        Seq("pri", "yr"), "bucket", tMicro = 150000L)
        .orderBy("pri", "yr")
    }),

// Personalized PageRank on the q94 mod-hub graph, teleport mass
    // concentrated on the doc_id%50 seed set, 3 exact integer rounds.
    "q279_ppr" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
        .where(col("src") =!= col("dst"))
      val seeds = docs.where(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id").as("node"))
      operators.Graph.personalizedPagerankInt(edges, "src", "dst",
        seeds, "node", iters = 3)
        .orderBy("node")
    }),

// Jarque–Bera normality per return flag from exact integer power
    // sums; the one float close is IEEE-deterministic (+,−,×,÷,√).
    "q277_jarque_bera" -> ((s, dir) => {
      operators.Stats.jarqueBera(
        t(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("qty")),
        "flag", "qty")
        .orderBy("key")
    }),

// The CDR fetch-step twin (reference data-raw/get_xbrl_zips.py):
    // quarterly period ends in range with the exact bulk-zip names the
    // pipeline's listZips pattern expects — pure date arithmetic, no
    // network, no table scan.
    "q243_fetch_plan" -> ((s, dir) => {
      graft.pipeline.FfiecPipeline.fetchPlan(s, "2001-01-01", "2005-12-31",
        kind = "xbrl")
    }),

// Composite candidate-key discovery over the arity-2 lattice:
    // o_orderkey is the only single key, so its three pairs are
    // lattice-IMPLIED (-1 sentinels, never scanned); of the scanned
    // pairs, (custkey,totalprice) and (orderdate,totalprice) surface
    // as MINIMAL composite keys.
    "q240_composite_keys" -> ((s, dir) => {
      operators.KeyChecks.compositeKeys(t(s, dir, "orders"),
        Seq("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        maxArity = 2)
        .orderBy("arity", "columns")
    }),

// Arity-3 lattice SCAN path: no single or pair among these four
    // lineitem columns is a key, so level 3 actually scans — and
    // (l_orderkey, l_partkey, l_suppkey) surfaces as the only
    // minimal TRIPLE key ((l_orderkey, l_linenumber) is famously
    // non-unique in this synthetic data).
    "q249_composite_arity3" -> ((s, dir) => {
      operators.KeyChecks.compositeKeys(t(s, dir, "lineitem"),
        Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey"),
        maxArity = 3)
        .orderBy("arity", "columns")
    }),

// Arity-3 lattice PRUNE path: o_orderkey (single) and the two
    // pair keys imply every one of the four triples — level 3 emits
    // only -1 sentinels and never scans (the compounding claim the
    // arity-2 gate q240 could not exercise).
    "q250_composite_pruned" -> ((s, dir) => {
      operators.KeyChecks.compositeKeys(t(s, dir, "orders"),
        Seq("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        maxArity = 3)
        .orderBy("arity", "columns")
    }),

// Zipf rank-frequency fit over the corpus's top-200 tokens — the
    // "is this natural language?" diagnostic: k-bounded top terms,
    // micro-quantized log-log OLS closed in one fixed-order float
    // expression (q219 discipline).
    "q244_zipf_fit" -> ((s, dir) => {
      operators.TextAnalytics.zipfFit(t(s, dir, "documents"), "text",
        maxRank = 200)
    }),

// Brown-Forsythe spread homogeneity of doc length across sources:
    // exact type-1 medians per group, |x - median| deviations, then
    // the one-way ANOVA F over the deviations.
    "q245_brown_forsythe" -> ((s, dir) => {
      operators.Stats.brownForsythe(
        t(s, dir, "documents").where(col("source").isNotNull),
        "source", "n_chars")
    }),

// Gumbel method-of-moments fit over calendar-month block maxima
    // of event value milli-units — the extreme-value screen.
    "q246_gumbel" -> ((s, dir) => {
      operators.Stats.gumbelBlockMaxima(
        events(s, dir).select(col("ts"),
          round(col("value") * 1000).cast("long").as("v")),
        "ts", "v")
    }),

// Jensen-Shannon divergence between the source mixes of the
    // English and non-English corpus halves, per-value terms.
    "q247_js_divergence" -> ((s, dir) => {
      val d = t(s, dir, "documents").where(col("source").isNotNull)
      operators.KeyChecks.jsDivergenceCells(
        d.where(col("lang") === "en"),
        d.where(col("lang") =!= "en"), "source")
        .orderBy("v")
    }))

  val oracles: Map[String, String] = Map(

// Null-safe tuple distincts via row(); the lattice prune replays
    // as CASE logic: a pair containing a single-column key carries the
    // -1 sentinels and is_key TRUE / is_minimal FALSE by implication.
    "q240_composite_keys" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT row(o_custkey)) AS BIGINT) AS dc,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mc,
        |  CAST(COUNT(DISTINCT row(o_orderdate)) AS BIGINT) AS dd,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS md,
        |  CAST(COUNT(DISTINCT row(o_orderkey)) AS BIGINT) AS dk,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mk,
        |  CAST(COUNT(DISTINCT row(o_totalprice)) AS BIGINT) AS dt,
        |  CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mt,
        |  CAST(COUNT(DISTINCT row(o_custkey, o_orderdate)) AS BIGINT) AS dcd,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL OR o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mcd,
        |  CAST(COUNT(DISTINCT row(o_custkey, o_totalprice)) AS BIGINT) AS dct,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mct,
        |  CAST(COUNT(DISTINCT row(o_orderdate, o_totalprice)) AS BIGINT) AS ddt,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mdt,
        |  CAST(COUNT(DISTINCT row(o_custkey, o_orderkey)) AS BIGINT) AS dck,
        |  CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL OR o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mck,
        |  CAST(COUNT(DISTINCT row(o_orderdate, o_orderkey)) AS BIGINT) AS ddk,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL OR o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mdk,
        |  CAST(COUNT(DISTINCT row(o_orderkey, o_totalprice)) AS BIGINT) AS dkt,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS mkt
        |FROM orders)
        |SELECT columns, CAST(arity AS BIGINT) AS arity, n, n_distinct,
        |  n_nulls, is_key, is_minimal_key
        |FROM (
        |  SELECT 'o_custkey' AS columns, 1 AS arity, n, dc AS n_distinct,
        |    mc AS n_nulls, dc = n AS is_key, dc = n AS is_minimal_key FROM s
        |  UNION ALL SELECT 'o_orderdate', 1, n, dd, md, dd = n, dd = n FROM s
        |  UNION ALL SELECT 'o_orderkey', 1, n, dk, mk, dk = n, dk = n FROM s
        |  UNION ALL SELECT 'o_totalprice', 1, n, dt, mt, dt = n, dt = n FROM s
        |  UNION ALL SELECT 'o_custkey,o_orderdate', 2, n,
        |    CASE WHEN dc = n OR dd = n THEN -1 ELSE dcd END,
        |    CASE WHEN dc = n OR dd = n THEN -1 ELSE mcd END,
        |    CASE WHEN dc = n OR dd = n THEN TRUE ELSE dcd = n END,
        |    CASE WHEN dc = n OR dd = n THEN FALSE ELSE dcd = n END FROM s
        |  UNION ALL SELECT 'o_custkey,o_orderkey', 2, n,
        |    CASE WHEN dc = n OR dk = n THEN -1 ELSE dck END,
        |    CASE WHEN dc = n OR dk = n THEN -1 ELSE mck END,
        |    CASE WHEN dc = n OR dk = n THEN TRUE ELSE dck = n END,
        |    CASE WHEN dc = n OR dk = n THEN FALSE ELSE dck = n END FROM s
        |  UNION ALL SELECT 'o_custkey,o_totalprice', 2, n,
        |    CASE WHEN dc = n OR dt = n THEN -1 ELSE dct END,
        |    CASE WHEN dc = n OR dt = n THEN -1 ELSE mct END,
        |    CASE WHEN dc = n OR dt = n THEN TRUE ELSE dct = n END,
        |    CASE WHEN dc = n OR dt = n THEN FALSE ELSE dct = n END FROM s
        |  UNION ALL SELECT 'o_orderdate,o_orderkey', 2, n,
        |    CASE WHEN dd = n OR dk = n THEN -1 ELSE ddk END,
        |    CASE WHEN dd = n OR dk = n THEN -1 ELSE mdk END,
        |    CASE WHEN dd = n OR dk = n THEN TRUE ELSE ddk = n END,
        |    CASE WHEN dd = n OR dk = n THEN FALSE ELSE ddk = n END FROM s
        |  UNION ALL SELECT 'o_orderdate,o_totalprice', 2, n,
        |    CASE WHEN dd = n OR dt = n THEN -1 ELSE ddt END,
        |    CASE WHEN dd = n OR dt = n THEN -1 ELSE mdt END,
        |    CASE WHEN dd = n OR dt = n THEN TRUE ELSE ddt = n END,
        |    CASE WHEN dd = n OR dt = n THEN FALSE ELSE ddt = n END FROM s
        |  UNION ALL SELECT 'o_orderkey,o_totalprice', 2, n,
        |    CASE WHEN dk = n OR dt = n THEN -1 ELSE dkt END,
        |    CASE WHEN dk = n OR dt = n THEN -1 ELSE mkt END,
        |    CASE WHEN dk = n OR dt = n THEN TRUE ELSE dkt = n END,
        |    CASE WHEN dk = n OR dt = n THEN FALSE ELSE dkt = n END FROM s)
        |ORDER BY arity, columns""".stripMargin,

// Quarter ends via month-series + last_day, names via strftime.
    "q243_fetch_plan" ->
      """WITH m AS (SELECT unnest(generate_series(DATE '2001-01-01',
        |             DATE '2005-12-31', INTERVAL 1 MONTH)) AS m),
        |q AS (SELECT DISTINCT last_day(m) AS period_end FROM m
        |      WHERE month(last_day(m)) IN (3, 6, 9, 12)
        |        AND last_day(m) >= DATE '2001-01-01'
        |        AND last_day(m) <= DATE '2005-12-31')
        |SELECT period_end,
        |  strftime(period_end, '%Y%m%d') AS period,
        |  'FFIEC CDR Call Bulk XBRL ' || strftime(period_end, '%m%d%Y')
        |    || '.zip' AS zip_name,
        |  'xbrl' AS kind
        |FROM q ORDER BY period_end""".stripMargin,

"q252_margin_pairs" -> marginPairsOracleSql,

"q262_kcenter_coreset" -> kCenterOracleSql(5),

"q261_hard_negatives" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c) x
         |  WHERE rk <= 2),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked
         |WHERE rank BETWEEN 2 AND 5
         |ORDER BY query_id, rank""".stripMargin,

"q260_entropy_ldiv" -> {
      val lnL = math.round(math.log(2.0) * 1e6)
      s"""WITH cells AS (
         |  SELECT o_orderpriority AS pri,
         |    CAST(year(o_orderdate) AS BIGINT) AS yr,
         |    o_orderstatus AS v, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM orders WHERE o_orderstatus IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |g AS (SELECT pri, yr, c,
         |        CAST(SUM(c) OVER (PARTITION BY pri, yr) AS BIGINT) AS n
         |      FROM cells),
         |t AS (SELECT pri, yr, n,
         |        CAST(round((-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
         |          * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6)
         |          AS BIGINT) AS tm
         |      FROM g)
         |SELECT pri, yr, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS n_values,
         |  CAST(SUM(tm) AS BIGINT) AS entropy_micro,
         |  (SUM(tm) < $lnL) AS risky,
         |  CAST($lnL AS BIGINT) AS threshold_micro
         |FROM t GROUP BY 1, 2 ORDER BY pri, yr""".stripMargin
    },

"q271_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS src,
        |    -(l_suppkey + 1) AS dst
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |hub1 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS h
        |         FROM e GROUP BY src),
        |auth1 AS (SELECT e.dst, CAST(SUM(h) AS BIGINT) AS a
        |          FROM e JOIN hub1 ON e.src = hub1.src GROUP BY e.dst),
        |hub2 AS (SELECT e.src, CAST(SUM(a) AS BIGINT) AS h
        |         FROM e JOIN auth1 ON e.dst = auth1.dst GROUP BY e.src),
        |auth2 AS (SELECT e.dst, CAST(SUM(h) AS BIGINT) AS a
        |          FROM e JOIN hub2 ON e.src = hub2.src GROUP BY e.dst),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
        |SELECT n.node, COALESCE(hub2.h, 0) AS hub,
        |  COALESCE(auth2.a, 0) AS auth
        |FROM nodes n
        |LEFT JOIN hub2 ON n.node = hub2.src
        |LEFT JOIN auth2 ON n.node = auth2.dst
        |ORDER BY n.node""".stripMargin,

"q272_adamic_adar" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey AS a, o_custkey AS z
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY z),
        |keep AS (SELECT z,
        |    CAST(round(1e6 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS term
        |  FROM deg WHERE d BETWEEN 2 AND 40),
        |p AS (SELECT e1.a AS a, e2.a AS b, k.term
        |      FROM e e1 JOIN e e2 ON e1.z = e2.z
        |      JOIN keep k ON k.z = e1.z
        |      WHERE e1.a < e2.a)
        |SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common,
        |  CAST(SUM(term) AS BIGINT) AS aa_micro
        |FROM p GROUP BY a, b HAVING COUNT(*) >= 2
        |ORDER BY a, b""".stripMargin,

"q273_kruskal_wallis" ->
      """WITH base AS (
        |  SELECT l_linestatus AS stratum, l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |cells AS (SELECT stratum, v, CAST(COUNT(*) AS BIGINT) AS t
        |          FROM base GROUP BY 1, 2),
        |cells2 AS (SELECT stratum, v, t,
        |    COALESCE(CAST(SUM(t) OVER (PARTITION BY stratum ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS c
        |  FROM cells),
        |r2 AS (SELECT stratum, v, 2 * c + t + 1 AS rank2 FROM cells2),
        |gv AS (SELECT stratum, g, v, CAST(COUNT(*) AS BIGINT) AS m
        |       FROM base GROUP BY 1, 2, 3),
        |grp AS (SELECT gv.stratum, g, CAST(SUM(m) AS BIGINT) AS ng,
        |    CAST(SUM(m * rank2) AS BIGINT) AS r2g
        |  FROM gv JOIN r2 ON gv.stratum = r2.stratum AND gv.v = r2.v
        |  GROUP BY 1, 2),
        |sums AS (SELECT stratum, CAST(SUM(ng) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM grp GROUP BY 1),
        |terms AS (SELECT grp.stratum, n, k,
        |    CAST(round(3.0 * CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |         * CAST(ng AS DOUBLE)) * 1e6) AS BIGINT) AS tq
        |  FROM grp JOIN sums ON grp.stratum = sums.stratum),
        |agg AS (SELECT stratum, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MAX(k) AS BIGINT) AS k,
        |    CAST(SUM(tq) AS BIGINT) AS h_plus
        |  FROM terms GROUP BY 1),
        |ties AS (SELECT stratum,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
        |  FROM cells GROUP BY 1),
        |hcalc AS (SELECT a.stratum, n, k,
        |    h_plus - 3 * (n + 1) * 1000000 AS hm,
        |    1.0 - CAST(tie_sum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         - CAST(n AS DOUBLE)) AS cfac
        |  FROM agg a JOIN ties t ON a.stratum = t.stratum)
        |SELECT stratum, n, k,
        |  CASE WHEN k >= 2 AND n > k
        |    THEN CAST(hm AS BIGINT) END AS h_micro,
        |  CASE WHEN k >= 2 AND n > k AND cfac > 0
        |    THEN CAST(round(CAST(hm AS DOUBLE) / cfac) AS BIGINT)
        |    END AS h_tied_micro
        |FROM hcalc ORDER BY stratum""".stripMargin,

"q274_inclusion_deps" -> Seq(
      ("cust_nation_in_nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("li_part_in_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("li_supp_in_supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("ord_cust_in_customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("part_in_li_part", "part", "p_partkey", "lineitem", "l_partkey"),
      ("supp_nation_in_cust_nation", "supplier", "s_nationkey",
        "customer", "c_nationkey"))
      .map { case (label, ct, cc, pt, pc) =>
        s"""SELECT '$label' AS pair,
           |  (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) FROM $ct
           |   WHERE $cc IS NOT NULL) AS n_child_distinct,
           |  (SELECT CAST(COUNT(DISTINCT $pc) AS BIGINT) FROM $pt
           |   WHERE $pc IS NOT NULL) AS n_parent_distinct,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
           |    (SELECT DISTINCT $cc AS v FROM $ct
           |     WHERE $cc IS NOT NULL) c
           |   WHERE v NOT IN (SELECT $pc FROM $pt
           |                   WHERE $pc IS NOT NULL)) AS n_missing""".stripMargin
      }
      .map(q => s"SELECT pair, n_child_distinct, n_parent_distinct, " +
        s"n_missing, (n_missing = 0) AS holds FROM ($q)")
      .mkString("", "\nUNION ALL\n", "\nORDER BY pair"),

"q275_doremi_step" ->
      """WITH g AS (SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_chars) AS BIGINT) AS sc
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
        |    CAST(SUM(sc) AS BIGINT) AS tsc FROM g),
        |d AS (SELECT domain, CAST((n * 1000000) // tn AS BIGINT) AS weight_ppm,
        |    CAST(round((CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(tsc AS DOUBLE) / CAST(tn AS DOUBLE))
        |      / (CAST(tsc AS DOUBLE) / CAST(tn AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS loss_micro
        |  FROM g CROSS JOIN tot),
        |r AS (SELECT domain, weight_ppm,
        |    CAST(round(CAST(weight_ppm AS DOUBLE)
        |      * exp(2000000.0 * CAST(loss_micro AS DOUBLE) / 1e12))
        |      AS BIGINT) AS raw_micro
        |  FROM d),
        |t2 AS (SELECT CAST(SUM(raw_micro) AS BIGINT) AS tot2,
        |    CAST(COUNT(*) AS BIGINT) AS k FROM r)
        |SELECT domain, weight_ppm, raw_micro,
        |  CAST((900000 * ((raw_micro * 1000000) // tot2)) // 1000000
        |    + (100000 // k) AS BIGINT) AS alpha_ppm
        |FROM r CROSS JOIN t2 ORDER BY domain""".stripMargin,

"q276_matryoshka" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |           FROM embeddings WHERE vec_id % 50 = 0),
         |fs AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.qvec")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |fr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM fs) x WHERE rank <= 5),
         |ps AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    ROUND(${cosSql("e.embedding[1:8]", "q.qvec[1:8]")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |pr AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM ps) x WHERE rank <= 5)
         |SELECT fr.query_id, CAST(5 AS BIGINT) AS k,
         |  CAST(COUNT(pr.neighbor_id) AS BIGINT) AS hits
         |FROM fr LEFT JOIN pr ON fr.query_id = pr.query_id
         |  AND fr.neighbor_id = pr.neighbor_id
         |GROUP BY fr.query_id ORDER BY fr.query_id""".stripMargin,

"q299_cliffs_delta" ->
      """WITH cells AS (
        |  SELECT l_linestatus AS stratum, l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_returnflag IN ('R', 'A')
        |  GROUP BY 1, 2, 3),
        |p AS (SELECT a.stratum,
        |    COALESCE(SUM(CASE WHEN a.v > b.v THEN a.c * b.c END), 0)
        |      AS gt,
        |    COALESCE(SUM(CASE WHEN a.v < b.v THEN a.c * b.c END), 0)
        |      AS lt,
        |    SUM(a.c * b.c) AS nn
        |  FROM cells a JOIN cells b
        |    ON a.stratum = b.stratum AND a.g = 'R' AND b.g = 'A'
        |  GROUP BY 1)
        |SELECT stratum,
        |  CAST(round((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
        |    / CAST(nn AS DOUBLE) * 1e6) AS BIGINT) AS delta_micro,
        |  CAST(nn AS BIGINT) AS n_pairs
        |FROM p ORDER BY stratum""".stripMargin,

"q298_kendall_tau" ->
      """WITH cells AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_discount * 100) AS BIGINT) AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |  GROUP BY 1, 2),
        |p AS (SELECT
        |    COALESCE(SUM(CASE WHEN b.y > a.y THEN a.c * b.c END), 0) AS cc,
        |    COALESCE(SUM(CASE WHEN b.y < a.y THEN a.c * b.c END), 0) AS dd
        |  FROM cells a JOIN cells b ON a.x < b.x),
        |tx AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS tx2,
        |    CAST(SUM(t) AS BIGINT) AS n
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY x)),
        |ty AS (SELECT COALESCE(SUM(t * (t - 1)), 0) AS ty2
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY y))
        |SELECT n, CAST(cc AS BIGINT) AS concordant,
        |  CAST(dd AS BIGINT) AS discordant,
        |  CASE WHEN n >= 2
        |    AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(tx2 AS DOUBLE) > 0
        |    AND CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(ty2 AS DOUBLE) > 0
        |  THEN CAST(round((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
        |    / (sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(tx2 AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
        |        - CAST(ty2 AS DOUBLE))) / 2.0) * 1e6) AS BIGINT)
        |  END AS tau_micro
        |FROM p CROSS JOIN tx CROSS JOIN ty""".stripMargin,

"q297_fd_error" ->
      """WITH cells AS (
        |  SELECT l_partkey AS x, l_linestatus AS y,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_partkey IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |px AS (SELECT x, CAST(MAX(c) AS BIGINT) AS mx,
        |    CAST(SUM(c) AS BIGINT) AS nx
        |  FROM cells GROUP BY 1)
        |SELECT CAST(SUM(nx) AS BIGINT) AS n,
        |  CAST(SUM(mx) AS BIGINT) AS n_keep,
        |  CAST(SUM(nx) - SUM(mx) AS BIGINT) AS n_remove,
        |  CAST(((SUM(nx) - SUM(mx)) * 1000000) // SUM(nx) AS BIGINT)
        |    AS g3_ppm,
        |  (SUM(mx) = SUM(nx)) AS holds
        |FROM px""".stripMargin,

"q296_ljung_box" -> {
      def lagCte(k: Int): String =
        s"""SELECT a.key, $k AS lag, CAST(COUNT(*) AS BIGINT) AS m,
           |  CAST(SUM(a.x * b.x) AS BIGINT) AS sxy,
           |  CAST(SUM(a.x) AS BIGINT) AS sh,
           |  CAST(SUM(b.x) AS BIGINT) AS st
           |FROM daily a JOIN daily b
           |  ON a.key = b.key AND b.d = a.d + $k
           |GROUP BY 1""".stripMargin
      s"""WITH daily AS (
         |  SELECT event_type AS key,
         |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
         |      AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |g AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS s1,
         |    CAST(SUM(x * x) AS BIGINT) AS s2
         |  FROM daily GROUP BY 1),
         |lags AS (${(1 to 4).map(lagCte).mkString("\n|UNION ALL\n|")}),
         |t AS (SELECT l.key, l.m,
         |    CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS den,
         |    (CAST(sxy AS DOUBLE)
         |      - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
         |        * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
         |      + CAST(m AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
         |    / (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS r,
         |    n
         |  FROM lags l JOIN g ON l.key = g.key
         |  WHERE l.m > 0)
         |SELECT key, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS k_lags,
         |  CASE WHEN MAX(n) > 4 AND
         |    COUNT(CASE WHEN den > 0 THEN 1 END) = COUNT(*)
         |  THEN CAST(MAX(n) * (MAX(n) + 2)
         |    * SUM(CASE WHEN den > 0
         |        THEN CAST(round(r * r * 1e6 / CAST(m AS DOUBLE))
         |          AS BIGINT) END) AS BIGINT)
         |  END AS q_micro
         |FROM t GROUP BY key ORDER BY key""".stripMargin
    },

"q295_salted_join" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS cents_total
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY s_name""".stripMargin,

"q292_conformal" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |  GROUP BY 1, 2),
        |r AS (SELECT grp, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY grp ORDER BY v) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
        |  FROM cells),
        |k AS (SELECT grp, v, cum, n,
        |    LEAST(n, ((n + 1) * 900000 + 999999) // 1000000) AS k
        |  FROM r)
        |SELECT grp AS "group", CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(k) AS BIGINT) AS k,
        |  CAST(MIN(v) AS BIGINT) AS threshold
        |FROM k WHERE cum >= k GROUP BY grp
        |ORDER BY "group"""".stripMargin,

"q293_simpson" ->
      """WITH cells AS (
        |  SELECT source AS grp, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM (SELECT source,
        |      unnest(list_filter(string_split_regex(trim(lower(text)),
        |        '\s+'), x -> x <> '')) AS tok
        |    FROM documents) t
        |  GROUP BY 1, 2),
        |g AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    SUM(c * (c - 1)) AS s2
        |  FROM cells GROUP BY 1)
        |SELECT grp AS "group", n_tokens, n_types,
        |  CASE WHEN n_tokens >= 2 THEN
        |    CAST(round(CAST(s2 AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE)
        |         * (CAST(n_tokens AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)
        |    END AS simpson_micro,
        |  CASE WHEN n_tokens >= 2 THEN
        |    CAST(round((1.0 - CAST(s2 AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE)
        |         * (CAST(n_tokens AS DOUBLE) - 1.0))) * 1e6) AS BIGINT)
        |    END AS gini_simpson_micro
        |FROM g ORDER BY "group"""".stripMargin,

"q294_nelson_aalen" ->
      """WITH a AS (SELECT user_id AS u, MIN(epoch_us(ts)) AS ta
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT a.u, (MIN(tb) - ta) // 1000000 AS t, true AS e
        |         FROM a JOIN (SELECT user_id AS u, epoch_us(ts) AS tb
        |                      FROM events WHERE event_type = 'purchase') b
        |           ON a.u = b.u AND b.tb > a.ta
        |         GROUP BY a.u, ta),
        |lastev AS (SELECT user_id AS u, MAX(epoch_us(ts)) AS tmax
        |           FROM events GROUP BY 1),
        |cens AS (SELECT a.u, (tmax - ta) // 1000000 AS t, false AS e
        |         FROM a JOIN lastev ON a.u = lastev.u
        |         WHERE a.u NOT IN (SELECT u FROM conv)),
        |subj AS (SELECT 'c' || CAST(u % 2 AS VARCHAR) AS key, t,
        |           CAST(e AS BIGINT) AS e
        |         FROM (SELECT * FROM conv UNION ALL SELECT * FROM cens)),
        |cells AS (SELECT key, t, CAST(COUNT(*) AS BIGINT) AS c,
        |            CAST(SUM(e) AS BIGINT) AS d
        |          FROM subj GROUP BY 1, 2),
        |ar AS (SELECT key, t, d,
        |         CAST(SUM(c) OVER (PARTITION BY key ORDER BY t DESC)
        |           AS BIGINT) AS n_risk
        |       FROM cells),
        |terms AS (SELECT key, t, n_risk, d,
        |    CAST(round(CAST(d AS DOUBLE) * 1e6
        |      / CAST(n_risk AS DOUBLE)) AS BIGINT) AS tm
        |  FROM ar WHERE d > 0)
        |SELECT key, t, n_risk, d,
        |  CAST(SUM(tm) OVER (PARTITION BY key ORDER BY t) AS BIGINT)
        |    AS h_micro
        |FROM terms ORDER BY key, t""".stripMargin,

"q290_multi_needle" ->
      """WITH needles(needle) AS (VALUES ('batch window'),
        |  ('customer query'), ('key agg'), ('slow key'), ('spark'))
        |SELECT doc_id, needle,
        |  CAST((length(text) - length(replace(text, needle, '')))
        |    // length(needle) AS BIGINT) AS n_hits
        |FROM documents CROSS JOIN needles
        |WHERE contains(text, needle)
        |ORDER BY doc_id, needle""".stripMargin,

"q291_heavy_hitters" ->
      """SELECT term, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)),
        |                            '\s+'), x -> x <> '')) AS term
        |  FROM documents) t
        |GROUP BY term
        |ORDER BY n DESC, term ASC
        |LIMIT 15""".stripMargin,

// packed-BIGINT state (see holtHalfPerKey scaladoc: DuckDB's
    // list_reduce updates struct accumulators field-IN-PLACE, so a
    // struct fold diverges — a scalar state cannot); a raw first
    // element is < 2^40, any packed state is > 10^17
    "q288_holt" ->
      """SELECT user_id, CAST(cnt AS BIGINT) AS n,
        |  CASE WHEN st < 1099511627776 THEN st
        |    ELSE st // 2147483648 - 1073741824 END AS level_milli,
        |  CASE WHEN st < 1099511627776 THEN 0
        |    ELSE st % 2147483648 - 1073741824 END AS trend_milli
        |FROM (
        |  SELECT user_id, COUNT(*) AS cnt,
        |    list_reduce(
        |      list(CAST(round(value * 1000) AS BIGINT)
        |           ORDER BY ts, CAST(round(value * 1000) AS BIGINT)),
        |      (a, x) -> CASE WHEN a < 1099511627776 THEN
        |          ((x + a) // 2 + 1073741824) * 2147483648
        |          + ((((x + a) // 2) - a) // 2 + 1073741824)
        |        ELSE
        |          ((x + ((a // 2147483648) - 1073741824)
        |              + ((a % 2147483648) - 1073741824)) // 2
        |            + 1073741824) * 2147483648
        |          + ((((a % 2147483648) - 1073741824)
        |              + ((x + ((a // 2147483648) - 1073741824)
        |                  + ((a % 2147483648) - 1073741824)) // 2
        |                 - ((a // 2147483648) - 1073741824))) // 2
        |            + 1073741824)
        |        END) AS st
        |  FROM events GROUP BY user_id) z
        |ORDER BY user_id""".stripMargin,

"q289_unimax" ->
      """WITH g AS (SELECT source AS grp,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_units
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |c AS (SELECT grp, n_units, n_units * 2 AS capacity FROM g),
        |r1 AS (SELECT grp, n_units, capacity,
        |    ROW_NUMBER() OVER (ORDER BY capacity, grp) AS k,
        |    COUNT(*) OVER () AS n,
        |    COALESCE(SUM(capacity) OVER (ORDER BY capacity, grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prefix
        |  FROM c),
        |r2 AS (SELECT *,
        |    (capacity * (n - k + 1) <= 600000 - prefix) AS capped
        |  FROM r1),
        |r3 AS (SELECT *,
        |    COALESCE(SUM(CASE WHEN capped THEN capacity END) OVER (), 0)
        |      AS cap_total,
        |    n - COALESCE(SUM(CASE WHEN capped THEN 1 END) OVER (), 0)
        |      AS m,
        |    ROW_NUMBER() OVER (ORDER BY capped, capacity, grp) AS ur
        |  FROM r2)
        |SELECT grp, n_units, CAST(capacity AS BIGINT) AS capacity,
        |  capped,
        |  CAST(CASE WHEN capped THEN capacity
        |    ELSE (600000 - cap_total) // m
        |      + (CASE WHEN ur <= (600000 - cap_total) % m
        |         THEN 1 ELSE 0 END) END AS BIGINT) AS alloc
        |FROM r3 ORDER BY grp""".stripMargin,

"q284_bh_fdr" ->
      s"""WITH tests AS (
         |  SELECT n_name AS test,
         |    ${md5Hash64Sql("n_name")} % 1000000 AS p_micro
         |  FROM nation),
         |ranked AS (SELECT test, CAST(p_micro AS BIGINT) AS p_micro,
         |    ROW_NUMBER() OVER (ORDER BY p_micro, test) AS rank,
         |    COUNT(*) OVER () AS m
         |  FROM tests),
         |ks AS (SELECT test, p_micro, CAST(rank AS BIGINT) AS rank,
         |    MAX(CASE WHEN p_micro * m <= rank * 200000
         |        THEN rank ELSE 0 END) OVER () AS kstar
         |  FROM ranked)
         |SELECT test, p_micro, rank, (rank <= kstar) AS reject
         |FROM ks ORDER BY rank""".stripMargin,

"q285_vocab_overlap" ->
      """WITH gt AS (
        |  SELECT DISTINCT source AS g,
        |    unnest(list_filter(string_split_regex(trim(lower(text)),
        |      '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |sizes AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS v
        |          FROM gt GROUP BY g),
        |inter AS (SELECT a.g AS g_a, b.g AS g_b,
        |    CAST(COUNT(*) AS BIGINT) AS intersection
        |  FROM gt a JOIN gt b ON a.tok = b.tok AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT g_a, g_b, sa.v AS vocab_a, sb.v AS vocab_b, intersection,
        |  (intersection * 1000000) // (sa.v + sb.v - intersection)
        |    AS jaccard_micro
        |FROM inter JOIN sizes sa ON sa.g = g_a
        |JOIN sizes sb ON sb.g = g_b
        |ORDER BY g_a, g_b""".stripMargin,

"q286_neyman" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS stratum,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS s1,
        |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)
        |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS s2
        |  FROM orders WHERE o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |sg AS (SELECT stratum, n_rows,
        |    CASE WHEN n_rows >= 2 AND
        |      (CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))
        |      > 0
        |    THEN CAST(round(sqrt(
        |      (CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |      / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))))
        |      AS BIGINT)
        |    ELSE 0 END AS sigma_int
        |  FROM g),
        |w AS (SELECT stratum, n_rows, sigma_int,
        |    n_rows * sigma_int AS w,
        |    CAST(SUM(n_rows * sigma_int) OVER () AS BIGINT) AS tw
        |  FROM sg),
        |b AS (SELECT stratum, n_rows, sigma_int, tw,
        |    CASE WHEN tw > 0 THEN (1000 * w) // tw ELSE 0 END AS base,
        |    CASE WHEN tw > 0 THEN (1000 * w) % tw ELSE 0 END AS rem
        |  FROM w),
        |fin AS (SELECT stratum, n_rows, sigma_int, tw, base,
        |    1000 - CAST(SUM(base) OVER () AS BIGINT) AS leftn,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, stratum ASC) AS pri
        |  FROM b)
        |SELECT stratum, n_rows, sigma_int,
        |  CAST(CASE WHEN tw > 0
        |    THEN base + (CASE WHEN pri <= leftn THEN 1 ELSE 0 END)
        |    ELSE 0 END AS BIGINT) AS alloc
        |FROM fin ORDER BY stratum""".stripMargin,

"q287_cochran_armitage" ->
      """WITH cells AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1),
        |c2 AS (SELECT w, n, r,
        |    CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
        |    CAST(SUM(r) OVER () AS BIGINT) AS tot_r
        |  FROM cells),
        |agg AS (SELECT CAST(MAX(tot_n) AS BIGINT) AS nn,
        |    CAST(MAX(tot_r) AS BIGINT) AS rr,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    SUM(w * n) AS swn, SUM(w * w * n) AS swwn,
        |    SUM(w * (r * tot_n - n * tot_r)) AS t_num
        |  FROM c2)
        |SELECT nn AS n, k, CAST(t_num AS BIGINT) AS t_num,
        |  CASE WHEN CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)
        |      * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * CAST(nn AS DOUBLE)
        |      * (CAST(nn AS DOUBLE) * CAST(swwn AS DOUBLE)
        |         - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)) > 0
        |    THEN CAST(round(CAST(t_num AS DOUBLE)
        |      / sqrt(CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)
        |        * (1.0 - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * CAST(nn AS DOUBLE)
        |        * (CAST(nn AS DOUBLE) * CAST(swwn AS DOUBLE)
        |           - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)))
        |      * 1e6) AS BIGINT)
        |    END AS z_micro
        |FROM agg""".stripMargin,

"q283_label_prop" -> {
      def round(i: Int): String =
        s"""l$i AS (SELECT node, label FROM (
           |    SELECT g.src AS node, l.label,
           |      ROW_NUMBER() OVER (PARTITION BY g.src
           |        ORDER BY COUNT(*) DESC, l.label ASC) AS rn
           |    FROM sym g JOIN l${i - 1} l ON l.node = g.dst
           |    GROUP BY g.src, l.label) x
           |  WHERE rn = 1)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |sym AS (SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e0
         |    UNION ALL SELECT dst, src FROM e0) u
         |  WHERE src <> dst),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, label FROM l3 ORDER BY node""".stripMargin
    },

"q282_rake" ->
      """WITH t0 AS (
        |  SELECT ' ' || regexp_replace(lower(text), '[^a-z0-9\s]+',
        |    ' | ', 'g') || ' ' AS s
        |  FROM documents),
        |t2 AS (
        |  SELECT regexp_replace(regexp_replace(s,
        |    ' (?:the|a|an|of|and|or|to|in|on|for|with|is|are|was|be|as|at|by|it|this|that|from) ',
        |    ' | ', 'g'),
        |    ' (?:the|a|an|of|and|or|to|in|on|for|with|is|are|was|be|as|at|by|it|this|that|from) ',
        |    ' | ', 'g') AS s
        |  FROM t0),
        |ph0 AS (SELECT unnest(string_split(s, '|')) AS p FROM t2),
        |ww AS (SELECT list_filter(string_split_regex(trim(p), '\s+'),
        |         x -> x <> '') AS w
        |       FROM ph0),
        |ph AS (SELECT array_to_string(w, ' ') AS phrase,
        |         CAST(len(w) AS BIGINT) AS plen, w
        |       FROM ww WHERE len(w) BETWEEN 1 AND 4),
        |wstat AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(plen) AS BIGINT) AS deg
        |  FROM (SELECT unnest(w) AS word, plen FROM ph) x
        |  GROUP BY 1),
        |wsc AS (SELECT word, (deg * 1000000) // freq AS ws FROM wstat),
        |pc AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |       FROM ph GROUP BY 1),
        |psc AS (SELECT pc.phrase, pc.n_occurrences,
        |    CAST(SUM(ws) AS BIGINT) AS score_micro
        |  FROM pc, unnest(string_split(pc.phrase, ' ')) AS t(word)
        |  JOIN wsc USING (word)
        |  GROUP BY 1, 2)
        |SELECT phrase, n_occurrences, score_micro FROM psc
        |ORDER BY score_micro DESC, phrase LIMIT 25""".stripMargin,

"q280_episode_pairs" ->
      """WITH e AS (
        |  SELECT user_id AS u, event_type AS t, epoch_us(ts) AS ts
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL)
        |SELECT a.t AS a, b.t AS b, CAST(COUNT(*) AS BIGINT) AS support
        |FROM e a JOIN e b ON a.u = b.u AND b.ts > a.ts
        |  AND b.ts - a.ts <= 86400 * CAST(1000000 AS BIGINT)
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10
        |ORDER BY a, b""".stripMargin,

"q281_phrase_search" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, i
        |  FROM tk, unnest(range(1, len(t))) AS u(i)
        |  WHERE t[i] = 'table' AND t[i+1] = 'hash')
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM hits GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

"q278_tcloseness" ->
      """WITH base AS (SELECT o_orderpriority AS pri,
        |    CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS v
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |gc AS (SELECT pri, yr, v, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM base GROUP BY 1, 2, 3),
        |vc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cg
        |       FROM base GROUP BY 1),
        |grp AS (SELECT pri, yr, CAST(SUM(c) AS BIGINT) AS n
        |        FROM gc GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS nn,
        |        CAST(COUNT(*) AS BIGINT) AS m FROM vc),
        |grid AS (SELECT g.pri, g.yr, g.n, vc.v, vc.cg,
        |    COALESCE(gc.c, 0) AS c, tot.nn, tot.m
        |  FROM grp g CROSS JOIN vc
        |  LEFT JOIN gc ON gc.pri = g.pri AND gc.yr = g.yr AND gc.v = vc.v
        |  CROSS JOIN tot),
        |cum AS (SELECT pri, yr, n, m, nn,
        |    SUM(c * nn - cg * n) OVER (PARTITION BY pri, yr
        |      ORDER BY v) AS d
        |  FROM grid),
        |agg AS (SELECT pri, yr, CAST(MAX(n) AS BIGINT) AS n,
        |    CAST(MAX(m) AS BIGINT) AS m, CAST(MAX(nn) AS BIGINT) AS nn,
        |    CAST(SUM(ABS(d)) AS BIGINT) AS sabs
        |  FROM cum GROUP BY 1, 2),
        |e AS (SELECT pri, yr, n, m,
        |    CASE WHEN m <= 1 THEN 0
        |      ELSE CAST(round(CAST(sabs AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)
        |           * (CAST(m AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)
        |      END AS emd_micro
        |  FROM agg)
        |SELECT pri, yr, n, m, emd_micro, (emd_micro > 150000) AS risky
        |FROM e ORDER BY pri, yr""".stripMargin,

"q279_ppr" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e2.dst, SUM(r.rank_micro // o.n) AS s
           |       FROM e2 JOIN r${i - 1} r ON r.node = e2.src
           |       JOIN outdeg o ON o.src = e2.src GROUP BY e2.dst),
           |r$i AS (SELECT nodes.node,
           |         CAST(CASE WHEN nodes.node % 50 = 0 THEN bs.b ELSE 0 END
           |              + (COALESCE(c$i.s, 0) * 85) // 100 AS BIGINT)
           |           AS rank_micro
           |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node
           |       CROSS JOIN bs)""".stripMargin
      s"""WITH e AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
         |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |ns AS (SELECT COUNT(*) AS n,
         |       COUNT(*) FILTER (node % 50 = 0) AS s FROM nodes),
         |bs AS (SELECT (15 * 10000 * n) // s AS b FROM ns),
         |outdeg AS (SELECT src, COUNT(*) AS n FROM e2 GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro
         |       FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
    },

"q277_jarque_bera" ->
      """WITH base AS (SELECT l_returnflag AS key,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |g AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(q) AS BIGINT) AS s1, CAST(SUM(q*q) AS BIGINT) AS s2,
        |    CAST(SUM(q*q*q) AS BIGINT) AS s3,
        |    CAST(SUM(q*q*q*q) AS BIGINT) AS s4
        |  FROM base GROUP BY 1),
        |m AS (SELECT key, n,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM g),
        |cm AS (SELECT key, n,
        |    r2 - m1 * m1 AS m2,
        |    r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
        |    r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
        |      - 3.0 * m1 * m1 * m1 * m1 AS m4
        |  FROM m),
        |sk AS (SELECT key, n, m2,
        |    m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt
        |  FROM cm)
        |SELECT key, n,
        |  CASE WHEN n >= 2 AND m2 > 0
        |    THEN CAST(round(skew * 1e6) AS BIGINT) END AS skew_micro,
        |  CASE WHEN n >= 2 AND m2 > 0
        |    THEN CAST(round(kurt * 1e6) AS BIGINT) END AS kurt_micro,
        |  CASE WHEN n >= 2 AND m2 > 0
        |    THEN CAST(round(CAST(n AS DOUBLE) / 6.0
        |      * (skew * skew + 0.25 * (kurt - 3.0) * (kurt - 3.0)) * 1e6)
        |      AS BIGINT) END AS jb_micro
        |FROM sk ORDER BY key""".stripMargin,

// q22's whitespace words + the RE2-portable piece regex, summed
    // exactly per lang; the ratio in the operator's float order.
    "q253_fertility" ->
      """WITH h AS (
        |  SELECT lang AS key,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |                    x -> x <> '')) AS w,
        |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]')) AS p
        |  FROM documents WHERE lang IS NOT NULL)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(w), 0) AS BIGINT) AS n_words,
        |  CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pieces,
        |  CASE WHEN COALESCE(SUM(w), 0) > 0
        |    THEN CAST(round(CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
        |      * 1e6) AS BIGINT) END AS fertility_micro
        |FROM h GROUP BY 1 ORDER BY key""".stripMargin,

// Same synthetic chrome injection, per-(domain, line) distinct-doc
    // share vs domain doc count in pure integers, reassembly by
    // position-ordered string_agg of surviving lines.
    "q254_domain_boilerplate" ->
      """WITH synth AS (
        |  SELECT doc_id, CAST(doc_id % 12 AS VARCHAR) AS dom,
        |    'NAV home about contact dom=' || CAST(doc_id % 12 AS VARCHAR)
        |      || chr(10) || text || chr(10)
        |      || 'Copyright dom=' || CAST(doc_id % 12 AS VARCHAR) AS raw
        |  FROM documents),
        |base AS (SELECT doc_id, dom, string_split(raw, chr(10)) AS paras
        |         FROM synth),
        |kz AS (SELECT doc_id, dom,
        |         unnest(list_zip(paras, range(1, len(paras) + 1))) AS z
        |       FROM base),
        |k AS (SELECT doc_id, dom, z[1] AS line, z[2] AS pos FROM kz),
        |ld AS (SELECT dom, line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS c
        |       FROM k GROUP BY 1, 2),
        |nd AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1),
        |boiler AS (SELECT ld.dom, ld.line FROM ld JOIN nd ON ld.dom = nd.dom
        |           WHERE n >= 3 AND c * 1000000 >= 600000 * n),
        |keep AS (SELECT k.doc_id, k.pos, k.line FROM k
        |         LEFT JOIN boiler b ON k.dom = b.dom AND k.line = b.line
        |         WHERE b.line IS NULL),
        |agg AS (SELECT doc_id,
        |          string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |          CAST(COUNT(*) AS BIGINT) AS kept
        |        FROM keep GROUP BY 1)
        |SELECT base.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
        |  CAST(len(base.paras) AS INTEGER) AS n_lines,
        |  CAST(len(base.paras) - COALESCE(kept, 0) AS INTEGER) AS n_removed
        |FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id
        |ORDER BY base.doc_id""".stripMargin,

"q255_corr_matrix" -> corrMatrixOracleSql(
      """SELECT CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |  CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
        |  CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
        |FROM lineitem""".stripMargin,
      Seq("qty", "price_c", "disc_bp", "tax_bp")),

"q249_composite_arity3" -> compositeKeysOracleSql("lineitem",
      Seq("l_linenumber", "l_orderkey", "l_partkey", "l_suppkey"), 3),

"q250_composite_pruned" -> compositeKeysOracleSql("orders",
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"), 3),

// topTerms replay (q33 tokenization), row_number ranks over the
    // k-bounded head, micro-quantized logs summed exactly, then the
    // OLS close in the identical float order.
    "q244_zipf_fit" ->
      """WITH terms AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                              x -> x <> '')) AS term
        |    FROM documents) t
        |  GROUP BY term ORDER BY n DESC, term ASC LIMIT 200),
        |ranked AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS r
        |  FROM terms),
        |pts AS (
        |  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |  FROM ranked),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |        SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |        SUM(CAST(x AS HUGEINT) * x) AS sxx
        |      FROM pts),
        |f AS (SELECT k,
        |        CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS det,
        |        (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |          / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
        |             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        |        sx, sy FROM m)
        |SELECT k AS n_ranks,
        |  CASE WHEN k >= 2 AND det <> 0.0
        |    THEN CAST(round(slope * 1e6) AS BIGINT) END AS slope_micro,
        |  CASE WHEN k >= 2 AND det <> 0.0
        |    THEN CAST(round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |      / CAST(k AS DOUBLE) / 1e6 * 1e6) AS BIGINT) END AS intercept_micro
        |FROM f""".stripMargin,

// Type-1 median per source (q223 rank rule), |x − m| deviations,
    // then the q197 ANOVA replay over the deviations with a single
    // 'all' stratum — Brown–Forsythe IS that composition.
    "q245_brown_forsythe" ->
      """WITH r AS (
        |  SELECT source AS g, CAST(n_chars AS BIGINT) AS x
        |  FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL),
        |g1 AS (SELECT g, x, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM r GROUP BY 1, 2),
        |c1 AS (SELECT g, x, c,
        |         SUM(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |         SUM(c) OVER (PARTITION BY g) AS n
        |       FROM g1),
        |med AS (SELECT g, x AS m FROM c1
        |        WHERE cum - c < GREATEST((500000 * n + 999999) // 1000000, 1)
        |          AND GREATEST((500000 * n + 999999) // 1000000, 1) <= cum),
        |z AS (SELECT r.g, abs(r.x - med.m) AS z
        |      FROM r JOIN med ON r.g = med.g),
        |grp AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
        |          CAST(SUM(z) AS BIGINT) AS sg,
        |          SUM(CAST(z AS HUGEINT) * z) AS ssg
        |        FROM z GROUP BY 1),
        |q AS (SELECT ng, sg, ssg,
        |        CAST(round((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |          / CAST(ng AS DOUBLE)) * 1e6) AS HUGEINT) AS rq6
        |      FROM grp),
        |a AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
        |        CAST(COUNT(*) AS BIGINT) AS k,
        |        CAST(SUM(sg) AS BIGINT) AS s, SUM(ssg) AS ss,
        |        SUM(rq6) AS rq6
        |      FROM q),
        |f AS (SELECT n, k,
        |        CAST(rq6 AS DOUBLE) / 1e6
        |          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |            / CAST(n AS DOUBLE) AS ssb,
        |        CAST(ss AS DOUBLE) - CAST(rq6 AS DOUBLE) / 1e6 AS ssw
        |      FROM a)
        |SELECT n, k,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0
        |    THEN CAST(round((ssb / (CAST(k AS DOUBLE) - 1.0))
        |      / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) * 1e6)
        |      AS BIGINT) END AS f_micro
        |FROM f""".stripMargin,

// Calendar-month block maxima, then the method-of-moments close
    // (β = s·√6/π, μ = x̄ − γβ) in the identical float order over
    // exact integer moments.
    "q246_gumbel" ->
      """WITH blocks AS (
        |  SELECT date_trunc('month', ts) AS block,
        |    MAX(CAST(round(value * 1000) AS BIGINT)) AS mx
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |        CAST(SUM(mx) AS BIGINT) AS s,
        |        SUM(CAST(mx AS HUGEINT) * mx) AS ss
        |      FROM blocks),
        |f AS (SELECT n_blocks,
        |        CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean,
        |        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |           / CAST(n_blocks AS DOUBLE))
        |          / (CAST(n_blocks AS DOUBLE) - 1.0) AS vs
        |      FROM m)
        |SELECT n_blocks,
        |  CASE WHEN n_blocks >= 1
        |    THEN CAST(round(mean * 1e6) AS BIGINT) END AS mean_micro,
        |  CASE WHEN n_blocks >= 2 AND vs > 0
        |    THEN CAST(round(sqrt(vs * 6.0) / pi() * 1e6) AS BIGINT)
        |  END AS beta_micro,
        |  CASE WHEN n_blocks >= 2 AND vs > 0
        |    THEN CAST(round((mean - 0.5772156649015329
        |      * (sqrt(vs * 6.0) / pi())) * 1e6) AS BIGINT)
        |  END AS mu_micro
        |FROM f""".stripMargin,

// Exact counts per source on each side, full-outer aligned, then
    // the JS term ½p·ln(p/m) per half in the identical float order —
    // raw unsmoothed probabilities (the mixture absorbs zeros).
    "q247_js_divergence" ->
      """WITH a AS (
        |  SELECT CAST(source AS VARCHAR) AS v, CAST(COUNT(*) AS BIGINT) AS c_a
        |  FROM documents WHERE source IS NOT NULL AND lang = 'en'
        |  GROUP BY 1),
        |b AS (
        |  SELECT CAST(source AS VARCHAR) AS v, CAST(COUNT(*) AS BIGINT) AS c_b
        |  FROM documents WHERE source IS NOT NULL AND lang <> 'en'
        |  GROUP BY 1),
        |j AS (SELECT COALESCE(a.v, b.v) AS v,
        |        COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        |      FROM a FULL OUTER JOIN b ON a.v = b.v),
        |t AS (SELECT CAST(GREATEST(1, SUM(c_a)) AS BIGINT) AS na,
        |        CAST(GREATEST(1, SUM(c_b)) AS BIGINT) AS nb FROM j),
        |p AS (SELECT v, c_a, c_b,
        |        CAST(c_a AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
        |        CAST(c_b AS DOUBLE) / CAST(nb AS DOUBLE) AS pb
        |      FROM j CROSS JOIN t)
        |SELECT v, c_a, c_b,
        |  CAST(round((CASE WHEN c_a > 0
        |      THEN pa * ln(pa / ((pa + pb) / 2.0)) ELSE 0.0 END * 0.5
        |    + CASE WHEN c_b > 0
        |      THEN pb * ln(pb / ((pa + pb) / 2.0)) ELSE 0.0 END * 0.5)
        |    * 1e6) AS BIGINT) AS js_term_micro
        |FROM p ORDER BY v""".stripMargin)
}
