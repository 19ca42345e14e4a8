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

/** Gate registry, corpus analytics, rounds 1-4 (mixing, packing, stores, sampling) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8; zero behavior
  * change, every entry byte-identical to the monolith at split
  * time). SparkEntry concatenates the family maps back into the
  * driver contract. Round 13: the q104+ pipeline block moved
  * verbatim to [[GatesAnalyticsPipeline]] (registry growth watch).
  */
private[graft] object GatesAnalyticsCore {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

"q32_redact_pii" -> ((s, dir) => {
      val synth = t(s, dir, "documents").select(
        col("doc_id"),
        concat(substring(col("text"), 1, 20),
          lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("raw"))
      synth.select(col("doc_id"),
          TextAnalytics.redactPii(col("raw")).as("redacted"))
        .orderBy("doc_id")
    }),

"q33_top_terms" -> ((s, dir) => {
      TextAnalytics.topTerms(t(s, dir, "documents"), "text", 20)
    }),

"q34_bigram_counts" -> ((s, dir) => {
      TextAnalytics.bigramCounts(t(s, dir, "documents"), "text", minCount = 5)
        .orderBy("bigram")
    }),

"q35_contamination" -> ((s, dir) => {
      TextAnalytics.contamination(t(s, dir, "documents"), "doc_id", "text",
        Seq("key agg", "batch window", "spark", "customer query"))
        .orderBy("doc_id", "needle")
    }),

"q47_repetition" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        round(TextAnalytics.repetitionRatio(col("text")), 6).as("rep_ratio"))
        .orderBy("doc_id")
    }),

"q48_domain_stats" -> ((s, dir) => {
      val synth = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" see https://site"), pmod(col("doc_id"), lit(20)),
          lit(".example.com/p/"), col("doc_id"),
          lit(" and http://mirror"), pmod(col("doc_id"), lit(7)),
          lit(".example.org/x")).as("raw"))
      TextAnalytics.domainStats(synth, "doc_id", "raw").orderBy("domain")
    }),

"q49_ngram_contamination" -> ((s, dir) => {
      TextAnalytics.ngramOverlap(t(s, dir, "documents"), "doc_id", "text",
        Seq("key agg", "batch window", "customer query", "slow scan", "fast merge"),
        n = 2)
        .orderBy("doc_id")
    }),

// The million-shingle decontamination path: the needle set is a
    // DATAFRAME (here: every distinct bigram of the doc_id%50==0
    // "benchmark" subset), broadcast once; the corpus makes ONE pass
    // (scan → broadcast semi-probe → per-doc aggregate). Same output
    // contract as q49's literal-needle form.
    "q54_ngram_overlap_large" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val needles = docs.where(col("doc_id") % 50 === 0)
        .select(explode(
          array_distinct(graft.plans.native.wordShingles(col("text"), 2)))
          .as("shingle"))
      TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text", needles, n = 2)
        .orderBy("doc_id")
    }),

"q50_weighted_mixture" -> ((s, dir) => {
      operators.Sampling.weightedMixture(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id", "source",
        weights = Map("src0" -> 0.0, "src1" -> 0.25, "src2" -> 0.5),
        defaultWeight = 0.75)
        .orderBy("doc_id")
    }),

"q37_stratified_sample" -> ((s, dir) => {
      operators.Sampling.stratifiedHead(
        t(s, dir, "documents").select("doc_id", "source"), "source", "doc_id", n = 5)
        .orderBy("source", "doc_id")
    }),

"q38_salted_agg" -> ((s, dir) => {
      operators.Sampling.saltedAgg(events(s, dir), "event_type", "value", salts = 16)
        .orderBy("event_type")
    }),

"q39_quantiles" -> ((s, dir) => {
      operators.Sampling.quantiles(
        t(s, dir, "documents").select(col("n_chars").cast("double").as("n_chars")),
        "n_chars", Seq(0.25, 0.5, 0.75, 0.95))
    }),

"q40_dataset_split" -> ((s, dir) => {
      operators.Sampling.splitById(
        t(s, dir, "documents").select("doc_id", "source"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .orderBy("doc_id")
    }),

// Concat-and-chunk packing offsets: distributed two-phase prefix
    // sum (value-range buckets + tiny offset window) — never the
    // single-task global window the oracle is allowed to use.
    "q62_pack_chunks" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      // Empty docs carry NULL chunk bounds; the driver's hasher coerces
      // nullable int64 to float64, so pin every column to non-null long
      // (-1 sentinel, mirrored in the oracle) for a dtype-stable hash.
      operators.Sampling.packChunks(d, "doc_id", "n_tokens", seqLen = 512)
        .select(col("id").cast("long").as("id"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("offset").cast("long").as("offset"),
          coalesce(col("start_chunk").cast("long"), lit(-1L)).as("start_chunk"),
          coalesce(col("end_chunk").cast("long"), lit(-1L)).as("end_chunk"))
        .orderBy("id")
    }),

// DSIR importance scores: eval-split docs (doc_id%10=0) are the
    // target distribution; every doc scores its hashed unigram+bigram
    // log-ratio mass in integer micro-nats (decimal-exact across
    // engines; the float weight is score_micro/1e6).
    "q63_dsir_scores" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalytics.dsirScores(docs,
        docs.where(col("doc_id") % 10 === 0), "doc_id", "text",
        buckets = 4096, portableHash = true)
        .orderBy("doc_id")
    }),

// Packed-slice plan: q62's offsets exploded into one row per
    // (chunk, doc) token slice — the table a packed-sequence writer
    // consumes. Pure integer arithmetic, exact in any engine.
    "q67_pack_slices" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Sampling.packSlices(d, "doc_id", "n_tokens", seqLen = 512)
        .orderBy("chunk_id", "id")
    }),

// The skew-proof as-of through the SAME DuckDB ASOF ground truth
    // as q36 — gate-level proof the (key, epoch) two-phase merge is
    // observationally identical to the linear form.
    "q70_asof_bucketed" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
      val orders1 = t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      operators.AsOfJoin.asOfBucketed(ev, "user_id", "ts", "event_id",
        orders1, "o_custkey", "o_orderdate", "o_orderkey", epochs = 8)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate").cast("timestamp_ltz").cast("long").as("order_epoch"),
          col("o_totalprice"))
        .orderBy("event_id")
    }),

// Flagship one-call curation end-to-end: minhash pairs → star
    // components → keep-one-representative, all replayed by the
    // oracle (q17's sketch chain + q66's recursive closure).
    "q71_dedup_corpus" -> ((s, dir) => {
      Dedup.dedupCorpus(t(s, dir, "documents"), "doc_id", "text",
        tau = 0.35, portableHash = true)
        .select("doc_id", "source").orderBy("doc_id")
    }),

// Window-free latest-per-key: one-row-per-key-per-partition
    // partial aggregation, never a full-row window shuffle.
    "q77_keep_latest" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      operators.Sampling.keepLatest(o, "o_custkey", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey")
    }),

// Deterministic exact-size sample: bottom-100 md5 id hashes
    // (TakeOrdered — no sort shuffle), reproducible in any engine.
    "q78_sample_exact" -> ((s, dir) => {
      operators.Sampling.sampleExact(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", n = 100, portableHash = true)
        .orderBy("doc_id")
    }),

// Cross-corpus embedding pairs (semantic decontamination / bitext
    // join): even ids vs odd ids through the shared hyperplane-LSH
    // bucketing, cosine-verified — q45's machinery split across two
    // tables.
    "q96_embedding_across" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.embeddingPairsAcross(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding",
        tau = 0.45, planes = 8, dim = 64, seed = 7L, tables = 2)
        .orderBy("id_l", "id_r")
    }),

// JL random projection 64→8: each output dim an ordered-fold dot
    // with a seeded gaussian row, scaled 1/sqrt(8); quantized to exact
    // integer micros and comma-joined so the driver's comparator (which
    // lexsorts cell values — lists are unhashable there) sees a scalar
    // string column. The raw array form stays under ScalaTest.
    "q95_random_projection" -> ((s, dir) => {
      t(s, dir, "embeddings").where(col("vec_id") % 5 === 0)
        .select(col("vec_id"),
          concat_ws(",", transform(
            Vectors.randomProjection(col("embedding"), dim = 64, outDim = 8),
            x => round(round(x, 6) * 1e6).cast("long").cast("string")))
            .as("proj_micro"))
        .orderBy("vec_id")
    }),

// Integer-arithmetic PageRank over a synthesized link graph (every
    // doc links its two mod-hubs): 3 iterative-join rounds in exact
    // micro-unit longs, replayed round-for-round by the oracle.
    "q94_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
        .where(col("src") =!= col("dst"))
      operators.Graph.pagerankInt(edges, "src", "dst", iters = 3)
        .orderBy("node")
    }),

// PageRank with DANGLING-MASS redistribution: the same mod-hub
    // graph (whose low hubs are genuine sinks — a hub below 31 has both
    // self-loops dropped, so it absorbs rank), 3 rounds, each round
    // adding floor(sinkMass/N) to every node inside the damped term.
    // The oracle unrolls the same rounds with the dangling CTE — exact
    // integer replay of an iterative algorithm WITH a global term.
    "q99_pagerank_dangling" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(97)).as("dst"))
        .union(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id"), lit(31)).as("dst")))
        .where(col("src") =!= col("dst"))
      operators.Graph.pagerankInt(edges, "src", "dst", iters = 3,
        dangling = true)
        .orderBy("node")
    }),

// Linear quality-classifier inference in exact integer micro-units:
    // four count features, caller-supplied weights, logit threshold —
    // the fastText-style filtering pass with a decision boundary that
    // replays bit-for-bit (no sigmoid, no floats anywhere).
    "q100_quality_classifier" -> ((s, dir) => {
      TextAnalytics.linearQualityScore(t(s, dir, "documents"),
        "doc_id", "text",
        wTokens = 40000L, wChars = -100L, wPunct = -50000L,
        wStopwords = 100000L, biasMicro = -3000000L)
        .orderBy("doc_id")
    }),

// Quality-aware dedup: same minhash pairs + star components as q71,
    // but each cluster keeps its best member by (n_chars DESC, id ASC)
    // instead of the min id — production survivor selection. The oracle
    // extends q71's recursive closure with the same QUALIFY pick.
    "q101_dedup_keep_best" -> ((s, dir) => {
      Dedup.dedupCorpusKeepBest(t(s, dir, "documents"), "doc_id", "text",
        scoreCol = "n_chars", tau = 0.35, portableHash = true)
        .select("doc_id", "n_chars", "source").orderBy("doc_id")
    }),

// Hashed token IDS end-to-end: train BPE on the corpus, tokenize a
    // slice through the rank-map kernel, map every subword to
    // pmod(md5hash, 4096) — the (array<int>) form models consume. The
    // oracle rebuilds each doc's ordered id sequence from the unrolled
    // vocabulary (per-word subword lists flattened in word order).
    "q102_bpe_hashed_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      // comma-joined for the driver's comparator (q27 precedent); the
      // array form is exercised under ScalaTest.
      docs.where(col("doc_id") % 9 === 4)
        .select(col("doc_id"),
          concat_ws(",", transform(
            graft.operators.Bpe.encodeHashedIds(col("text"), merges, 4096),
            x => x.cast("string"))).as("token_ids"))
        .orderBy("doc_id")
    }),

// Deterministic training-order shuffle: the seeded md5 permutation
    // key, replayed exactly — the order a reader streams shuffled
    // shards in is an engine-independent function of (seed, id).
    "q103_shuffle_order" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") % 5 === 2)
        .select(col("doc_id"),
          operators.Sampling.shuffleKey(col("doc_id"), seed = 7L).as("skey"))
        .orderBy("skey", "doc_id")
    }),

// Count-min sketch: fixed-RAM token-frequency estimation — build
    // the d×width sketch over the corpus, then point-estimate a fixed
    // probe list (including an absent term → 0 or pure collision
    // noise). Cell-for-cell md5 replay in the oracle.
    "q93_cms_estimate" -> ((s, dir) => {
      val sketch = TextAnalytics.countMinSketch(
        t(s, dir, "documents"), "text", d = 4, width = 512)
      TextAnalytics.cmsEstimate(sketch,
        Seq("key", "agg", "table", "value", "spark", "window",
          "zzz_absent_term"), d = 4, width = 512)
        .orderBy("term")
    }),

// Per-key exact-size sampling: bottom-3 id-hashes per source via
    // map-side bounded heaps (the corpus never shuffles; the oracle's
    // QUALIFY-window formulation would).
    "q91_sample_per_key" -> ((s, dir) => {
      operators.Sampling.samplePerKey(
        t(s, dir, "documents").select("source", "doc_id"),
        "source", "doc_id", k = 3, portableHash = true)
        .orderBy("source", "doc_id")
    }),

// Dataset-card mixture manifest: per-source docs/tokens/share.
    "q69_mixture_manifest" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Sampling.mixtureManifest(d, "source", "n_tokens")
        .orderBy("source")
    }),

// End of the packing path: actual (chunk_id, tokens) training
    // sequences — every row exactly 512 tokens except the last. Tokens
    // are unit-separator-joined (words may contain commas) so the
    // driver's comparator sees a scalar string; array form in ScalaTest.
    "q68_pack_sequences" -> ((s, dir) => {
      operators.Sampling.packSequences(t(s, dir, "documents"),
        "doc_id", "text", seqLen = 512)
        .select(col("chunk_id"), concat_ws("\u001f", col("tokens")).as("tokens"))
        .orderBy("chunk_id")
    }),

// Token-type entropy in micro-nats: distributional repetition
    // signal (complements q47's adjacency signal).
    "q74_token_entropy" -> ((s, dir) => {
      operators.TextAnalytics.tokenEntropy(t(s, dir, "documents"),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

// Bigram-LM log-probability (CCNet-style perplexity filter) in
    // micro-nats: the corpus self-scored under its own add-one-
    // smoothed bigram model; the oracle refits the identical model
    // in SQL and mirrors ln((c2 + 1.0) / (c1 + V)) exactly.
    "q79_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalytics.lmScores(docs, docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

// BM25 topical relevance in integer micro-units (same decimal-
    // exact replay trick as q63): per-(doc,term) score rounded to
    // 1e-6 then summed exactly; the SQL mirrors the float expression
    // parenthesis-for-parenthesis.
    "q64_bm25" -> ((s, dir) => {
      operators.TextAnalytics.bm25Scores(t(s, dir, "documents"),
        "doc_id", "text", terms = Seq("spark", "join", "vector", "stream"))
        .orderBy("doc_id")
    }),

"q41_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_custkey", "drnk", "o_orderkey")
    }),

"q42_rollup" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      customer
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          decSum(col("c_acctbal")).as("sum_bal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

"q43_distinct_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

"q44_crossmodal_filter" -> ((s, dir) => {
      // curation join across modalities: text quality gates which
      // embeddings survive, then per-label survivor stats
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
      val emb = t(s, dir, "embeddings")
      emb.join(docs, emb("vec_id") === docs("doc_id"))
        .where(col("q") >= 0.5)
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
          // q has 6dp — decimal sum makes the mean order-independent
          round(sum(col("q").cast(DecimalType(28, 8))).cast("double")
            / count(lit(1)), 6).as("avg_quality"))
        .orderBy("label")
    }),

"q36_asof_join" -> ((s, dir) => {
      // dedupe orders to one per (custkey, orderdate) so the as-of pick
      // is unique, then point-in-time join events → latest prior order
      val w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
      val orders1 = t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      operators.AsOfJoin.asOf(ev, "user_id", "ts", "event_id",
        orders1, "o_custkey", "o_orderdate", "o_orderkey")
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          // o_orderdate is TIMESTAMP_NTZ; epoch via LTZ (session is UTC)
          col("o_orderdate").cast("timestamp_ltz").cast("long").as("order_epoch"),
          col("o_totalprice"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(

"q32_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM (SELECT doc_id,
        |        substring(text, 1, 20) || ' contact user' || doc_id ||
        |        '@mail.example.com or call 555-' ||
        |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        |      FROM documents) x
        |ORDER BY doc_id""".stripMargin,

"q33_top_terms" ->
      """SELECT term, COUNT(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                            x -> x <> '')) AS term
        |  FROM documents) t
        |GROUP BY term
        |ORDER BY n DESC, term ASC
        |LIMIT 20""".stripMargin,

"q34_bigram_counts" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT unnest(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |    ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |    END) AS bigram
         |  FROM toks)
         |SELECT bigram, COUNT(*) AS n FROM bg
         |GROUP BY bigram HAVING COUNT(*) >= 5
         |ORDER BY bigram""".stripMargin,

"q35_contamination" ->
      """SELECT doc_id, needle
        |FROM documents
        |CROSS JOIN (SELECT unnest(['key agg', 'batch window', 'spark', 'customer query']) AS needle) n
        |WHERE contains(lower(text), needle)
        |ORDER BY doc_id, needle""".stripMargin,

"q47_repetition" ->
      s"""SELECT doc_id,
         |  CASE WHEN len($toksLower) = 0 THEN 0.0
         |       ELSE ROUND(1.0 - len(list_distinct($toksLower)) * 1.0 / len($toksLower), 6)
         |  END AS rep_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

"q48_domain_stats" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' see https://site' || (doc_id % 20) || '.example.com/p/' || doc_id
        |         || ' and http://mirror' || (doc_id % 7) || '.example.org/x' AS raw
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_extract_all(lower(raw), 'https?://([a-z0-9.-]+)', 1))) AS domain
        |  FROM raw)
        |SELECT domain, COUNT(*) AS n_docs FROM d GROUP BY domain ORDER BY domain""".stripMargin,

"q49_ngram_contamination" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) AS bg
         |  FROM toks)
         |SELECT doc_id,
         |  CASE WHEN len(bg) = 0 THEN 0.0
         |       ELSE ROUND(len(list_intersect(bg,
         |         ['key agg', 'batch window', 'customer query', 'slow scan', 'fast merge'])) * 1.0
         |         / len(bg), 6) END AS overlap
         |FROM bg ORDER BY doc_id""".stripMargin,

// ngramOverlapLarge: the needle set is a table (distinct bigrams of
    // the doc_id%50==0 subset), joined — the plain-SQL shape of the
    // broadcast-probe plan.
    "q54_ngram_overlap_large" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) AS bg
         |  FROM toks),
         |needles AS (
         |  SELECT DISTINCT unnest(bg) AS shingle FROM bg WHERE doc_id % 50 = 0),
         |ex AS (SELECT doc_id, len(bg) AS n_sh, unnest(bg) AS shingle FROM bg),
         |hits AS (
         |  SELECT e.doc_id, any_value(e.n_sh) AS n_sh, COUNT(n.shingle) AS n_hit
         |  FROM ex e LEFT JOIN needles n ON e.shingle = n.shingle
         |  GROUP BY e.doc_id)
         |SELECT doc_id,
         |  CASE WHEN n_sh = 0 THEN 0.0
         |       ELSE ROUND(n_hit * 1.0 / n_sh, 6) END AS overlap
         |FROM hits ORDER BY doc_id""".stripMargin,

"q50_weighted_mixture" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS bucket,
         |    CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.25
         |                WHEN 'src2' THEN 0.5 ELSE 0.75 END AS w
         |  FROM documents) x
         |WHERE CAST(bucket AS DOUBLE) < w * 10000.0
         |ORDER BY doc_id""".stripMargin,

"q37_stratified_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents) x
        |WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,

"q38_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

"q39_quantiles" ->
      """SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75, 0.95]) AS quantiles
        |FROM documents""".stripMargin,

"q40_dataset_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN doc_id % 100 < 80 THEN 'train'
        |       WHEN doc_id % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

// Replays the full DSIR chain: normalized unigram+bigram grams,
    // md5 bucket hash, add-one-smoothed target/corpus multinomials,
    // per-bucket log-ratio rounded to micro-nats (the rounding is
    // what makes the per-doc BIGINT sum engine-exact), per-doc sum.
    "q63_dsir_scores" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |gr AS (
         |  SELECT doc_id, list_filter(list_concat(
         |      tk,
         |      CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |           ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END),
         |    x -> x IS NOT NULL AND x <> '') AS gr
         |  FROM tk),
         |ex AS (SELECT doc_id, unnest(gr) AS g FROM gr),
         |bx AS (SELECT doc_id, (${md5Hash64Sql("g")}) % 4096 AS b FROM ex),
         |cq AS (SELECT b, COUNT(*) AS c FROM bx GROUP BY b),
         |cp AS (SELECT b, COUNT(*) AS c FROM bx WHERE doc_id % 10 = 0 GROUP BY b),
         |tot AS (SELECT (SELECT COUNT(*) FROM bx WHERE doc_id % 10 = 0) AS np,
         |               (SELECT COUNT(*) FROM bx) AS nq),
         |lam AS (
         |  SELECT q.b,
         |    CAST(round(1e6 * ln(((COALESCE(p.c, 0) + 1.0) * (t.nq + 4096.0)) /
         |                        ((q.c + 1.0) * (t.np + 4096.0)))) AS BIGINT) AS lam
         |  FROM cq q LEFT JOIN cp p ON q.b = p.b CROSS JOIN tot t),
         |sc AS (
         |  SELECT bx.doc_id, CAST(SUM(l.lam) AS BIGINT) AS score
         |  FROM bx JOIN lam l ON bx.b = l.b GROUP BY bx.doc_id)
         |SELECT g2.doc_id, CAST(len(g2.gr) AS BIGINT) AS n_grams,
         |  COALESCE(sc.score, 0) AS score_micro
         |FROM gr g2 LEFT JOIN sc ON g2.doc_id = sc.doc_id
         |ORDER BY g2.doc_id""".stripMargin,

// q62's single-window ground truth exploded per straddled chunk;
    // slice bounds are GREATEST/LEAST integer clamps (no NULLs in
    // play, so Spark's null-skipping least() is equivalent).
    "q67_pack_slices" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT id, n_tokens,
         |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
         |  FROM t),
         |s AS (
         |  SELECT id, n_tokens, "offset",
         |    unnest(range("offset" // 512, ("offset" + n_tokens - 1) // 512 + 1)) AS chunk_id
         |  FROM c WHERE n_tokens > 0)
         |SELECT chunk_id, id,
         |  GREATEST("offset", chunk_id * 512) - "offset" AS doc_from,
         |  LEAST("offset" + n_tokens, (chunk_id + 1) * 512)
         |    - GREATEST("offset", chunk_id * 512) AS slice_len
         |FROM s ORDER BY chunk_id, id""".stripMargin,

// q17's sketch/banding chain at tau 0.35 feeding q66's recursive
    // transitive closure; survivors = docs that are their component's
    // min (or never paired).
    "q71_dedup_corpus" ->
      s"""${shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |p2 AS (
         |  SELECT id_a, id_b FROM prs
         |  WHERE len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0 >= 0.35),
         |eg AS (SELECT id_a AS u, id_b AS v FROM p2
         |       UNION SELECT id_b, id_a FROM p2),
         |r(u, v) AS (
         |  SELECT u, v FROM eg
         |  UNION
         |  SELECT r.u, eg.v FROM r JOIN eg ON r.v = eg.u),
         |m2 AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u)
         |SELECT d.doc_id, d.source
         |FROM documents d LEFT JOIN m2 ON d.doc_id = m2.id
         |WHERE m2.rep IS NULL OR m2.rep = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

// (o_orderdate, o_orderkey) is unique per customer row, so the
    // lexicographic struct max equals this QUALIFY pick exactly.
    "q77_keep_latest" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin,

"q78_sample_exact" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents ORDER BY h LIMIT 100) x
         |ORDER BY doc_id""".stripMargin,

// q45's bucketing replay with the pair join split even×odd and no
    // ordering constraint (ids come from different corpora).
    "q96_embedding_across" ->
      s"""WITH planes(t, i, plane) AS (VALUES
         |      ${hyperplanesSql(planes = 8, dim = 64, seed = 7L, tables = 2)}),
         |bucketed AS (
         |  SELECT e.vec_id, p.t,
         |    SUM(CASE WHEN ${seqDotSql("e.embedding", "p.plane", 64)} >= 0
         |        THEN CAST(power(2, p.i) AS BIGINT) ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, p.t),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_l, b.vec_id AS id_r
         |  FROM bucketed a
         |  JOIN bucketed b ON a.t = b.t AND a.bucket = b.bucket
         |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1)
         |SELECT c.id_l, c.id_r,
         |  ROUND(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.id_l
         |JOIN embeddings eb ON eb.vec_id = c.id_r
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
         |ORDER BY id_l, id_r""".stripMargin,

"q95_random_projection" -> {
      val rows = graft.functions.Vectors.projectionMatrix(64, 8, 7L)
      val vals = rows.zipWithIndex.map { case (r, j) =>
        s"($j, [${r.map(_.toString).mkString(", ")}])"
      }.mkString(",\n      ")
      val scale = (1.0 / math.sqrt(8.0)).toString
      s"""WITH proj(j, g) AS (VALUES
         |      $vals)
         |SELECT vec_id,
         |  array_to_string(
         |    list(CAST(ROUND(ROUND(dp * $scale, 6) * 1000000) AS BIGINT)
         |         ORDER BY j), ',') AS proj_micro FROM (
         |  SELECT e.vec_id, p.j,
         |    ${seqDotSql("e.embedding", "p.g", 64)} AS dp
         |  FROM embeddings e CROSS JOIN proj p
         |  WHERE e.vec_id % 5 = 0) x
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

"q94_pagerank" -> {
      def round(i: Int): String =
        s"""c$i AS (SELECT e2.dst, SUM(r.rank_micro // o.n) AS s
           |       FROM e2 JOIN r${i - 1} r ON r.node = e2.src
           |       JOIN outdeg o ON o.src = e2.src GROUP BY e2.dst),
           |r$i AS (SELECT nodes.node,
           |         CAST(150000 + (COALESCE(c$i.s, 0) * 85) // 100 AS BIGINT) AS rank_micro
           |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node)""".stripMargin
      s"""WITH e AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
         |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |outdeg AS (SELECT src, COUNT(*) AS n FROM e2 GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
    },

"q99_pagerank_dangling" -> {
      def round(i: Int): String =
        s"""d$i AS (SELECT COALESCE(SUM(rank_micro), 0) AS ds FROM r${i - 1}
           |       WHERE node NOT IN (SELECT src FROM outdeg)),
           |c$i AS (SELECT e2.dst, SUM(r.rank_micro // o.n) AS s
           |       FROM e2 JOIN r${i - 1} r ON r.node = e2.src
           |       JOIN outdeg o ON o.src = e2.src GROUP BY e2.dst),
           |r$i AS (SELECT nodes.node,
           |         CAST(150000 +
           |              ((COALESCE(c$i.s, 0) + d$i.ds // nn.n) * 85) // 100
           |           AS BIGINT) AS rank_micro
           |       FROM nodes LEFT JOIN c$i ON c$i.dst = nodes.node
           |       CROSS JOIN d$i CROSS JOIN nn)""".stripMargin
      s"""WITH e AS (
         |  SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id, doc_id % 31 FROM documents),
         |e2 AS (SELECT src, dst FROM e WHERE src <> dst),
         |nodes AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |outdeg AS (SELECT src, COUNT(*) AS n FROM e2 GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
    },

// Per-doc ordered id sequence rebuilt from the unrolled vocab: each
    // word's subword list (final-round symstr split) hashed per token,
    // flattened in word order; empty docs keep an empty INT[].
    "q102_bpe_hashed_ids" ->
      s"""${bpeRoundsCte(8)},
         |vt AS (SELECT word,
         |         string_split(substr(symstr, 2, len(symstr) - 2),
         |                      chr(30)||chr(31)) AS toks
         |       FROM w8),
         |docw AS (
         |  SELECT doc_id, u.i AS wi, u.w AS word FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
         |             i -> struct_pack(i := i, w := ws[i]))) AS u
         |    FROM (SELECT doc_id, $toksLower AS ws FROM documents
         |          WHERE doc_id % 9 = 4) z) x),
         |wid AS (
         |  SELECT dw.doc_id, dw.wi,
         |         list_transform(vt.toks,
         |           t -> CAST(${md5Hash64Sql("t")} % 4096 AS INT)) AS ids
         |  FROM docw dw JOIN vt ON vt.word = dw.word),
         |agg AS (
         |  SELECT doc_id, flatten(list(ids ORDER BY wi)) AS token_ids
         |  FROM wid GROUP BY doc_id)
         |SELECT d.doc_id,
         |  array_to_string(COALESCE(agg.token_ids, CAST([] AS INT[])), ',')
         |    AS token_ids
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 9 = 4) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

"q103_shuffle_order" ->
      """SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS skey
        |FROM documents WHERE doc_id % 5 = 2
        |ORDER BY skey, doc_id""".stripMargin,

"q100_quality_classifier" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS BIGINT) AS n_punct,
         |    CAST(len(list_filter($toksLower,
         |           x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) AS BIGINT) AS n_stopwords
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, n_tokens, n_chars, n_punct, n_stopwords,
         |    CAST(-3000000 + n_tokens * 40000 + n_chars * (-100)
         |         + n_punct * (-50000) + n_stopwords * 100000 AS BIGINT) AS logit_micro
         |  FROM f)
         |SELECT doc_id, n_tokens, n_chars, n_punct, n_stopwords, logit_micro,
         |       logit_micro >= 0 AS keep
         |FROM g ORDER BY doc_id""".stripMargin,

"q101_dedup_keep_best" ->
      s"""${shinglesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |hs AS (SELECT doc_id, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |slot AS (
         |  SELECT doc_id, j, MIN(xor(h, salt)) AS m
         |  FROM hs CROSS JOIN (VALUES ${xorSaltsSql(64, 42L)}) s(j, salt)
         |  GROUP BY doc_id, j),
         |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b*4+1 : b*4+4], ',')) AS bucket, sig
         |  FROM sig CROSS JOIN (SELECT unnest(range(16)) AS b) bb
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |p2 AS (
         |  SELECT id_a, id_b FROM prs
         |  WHERE len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0 >= 0.35),
         |eg AS (SELECT id_a AS u, id_b AS v FROM p2
         |       UNION SELECT id_b, id_a FROM p2),
         |r(u, v) AS (
         |  SELECT u, v FROM eg
         |  UNION
         |  SELECT r.u, eg.v FROM r JOIN eg ON r.v = eg.u),
         |m2 AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u),
         |keep AS (
         |  SELECT m2.id FROM m2 JOIN documents d ON d.doc_id = m2.id
         |  QUALIFY row_number() OVER (PARTITION BY m2.rep
         |    ORDER BY d.n_chars DESC NULLS LAST, m2.id ASC) = 1)
         |SELECT d.doc_id, d.n_chars, d.source
         |FROM documents d LEFT JOIN m2 ON d.doc_id = m2.id
         |             LEFT JOIN keep k ON d.doc_id = k.id
         |WHERE m2.rep IS NULL OR k.id IS NOT NULL
         |ORDER BY d.doc_id""".stripMargin,

"q93_cms_estimate" ->
      s"""WITH toks AS (SELECT unnest($toksLower) AS tok FROM documents),
         |cells AS (
         |  SELECT i AS row,
         |         ${md5Hash64Sql("(CAST(i AS VARCHAR) || '|' || tok)")} % 512 AS col,
         |         COUNT(*) AS c
         |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i) ii
         |  GROUP BY 1, 2),
         |probes(term) AS (VALUES ('key'), ('agg'), ('table'), ('value'),
         |                        ('spark'), ('window'), ('zzz_absent_term')),
         |pc AS (
         |  SELECT term, i AS row,
         |         ${md5Hash64Sql("(CAST(i AS VARCHAR) || '|' || term)")} % 512 AS col
         |  FROM probes CROSS JOIN (SELECT unnest(range(4)) AS i) ii)
         |SELECT term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
         |FROM pc LEFT JOIN cells USING (row, col)
         |GROUP BY term ORDER BY term""".stripMargin,

// Same bottom-k-per-key membership via the window form, ordered by
    // the same double-cast hash the aggregator ranks on.
    "q91_sample_per_key" ->
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY CAST(${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} AS DOUBLE) ASC,
         |               doc_id ASC) AS rn
         |  FROM documents) x
         |WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin,

"q69_mixture_manifest" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(n_tokens AS DOUBLE) /
        |        CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS token_share
        |FROM a ORDER BY source""".stripMargin,

// q67's slice table joined to the token arrays, chunk pieces
    // concatenated in id order (flatten of an ORDER BY id list agg).
    "q68_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id AS id,
         |    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
         |  FROM documents),
         |c AS (
         |  SELECT id, tk, CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(COALESCE(SUM(CAST(len(tk) AS BIGINT)) OVER (ORDER BY id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
         |  FROM t),
         |s AS (
         |  SELECT id, tk, n_tokens, "offset",
         |    unnest(range("offset" // 512, ("offset" + n_tokens - 1) // 512 + 1)) AS chunk_id
         |  FROM c WHERE n_tokens > 0),
         |p AS (
         |  SELECT chunk_id, id,
         |    tk[GREATEST("offset", chunk_id * 512) - "offset" + 1 :
         |       LEAST("offset" + n_tokens, (chunk_id + 1) * 512) - "offset"] AS piece
         |  FROM s)
         |SELECT chunk_id,
         |  array_to_string(flatten(list(piece ORDER BY id)), chr(31)) AS tokens
         |FROM p GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,

// -p·ln(p) per token type, rounded to micro-nats, summed exactly;
    // operand order mirrored: (c / CAST(n AS DOUBLE)).
    "q74_token_entropy" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |n AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM tk),
         |ex AS (SELECT doc_id, unnest(tk) AS t FROM tk),
         |c AS (SELECT doc_id, t, COUNT(*) AS c FROM ex GROUP BY doc_id, t),
         |m AS (
         |  SELECT c.doc_id,
         |    CAST(round(1e6 * -((c.c / CAST(n.n_tokens AS DOUBLE)) *
         |      ln(c.c / CAST(n.n_tokens AS DOUBLE)))) AS BIGINT) AS mm
         |  FROM c JOIN n ON c.doc_id = n.doc_id),
         |s AS (SELECT doc_id, CAST(SUM(mm) AS BIGINT) AS e FROM m GROUP BY doc_id)
         |SELECT n.doc_id, n.n_tokens, COALESCE(s.e, 0) AS entropy_micro
         |FROM n LEFT JOIN s ON n.doc_id = s.doc_id
         |ORDER BY n.doc_id""".stripMargin,

// The oracle refits the add-one bigram LM from scratch: strict
    // adjacent bigrams (none for <2 tokens), context = first word,
    // V = distinct token types; per-occurrence micro-nat rounding
    // mirrors lmScores' ln((c2 + 1.0) / (c1 + V)) operand order.
    "q79_lm_score" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
         |      END AS bg
         |  FROM tk),
         |n AS (SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams FROM bg),
         |ex AS (SELECT doc_id, unnest(bg) AS b FROM bg),
         |c2 AS (SELECT b, COUNT(*) AS c2 FROM ex GROUP BY b),
         |c1 AS (SELECT split_part(b, ' ', 1) AS w1, COUNT(*) AS c1 FROM ex GROUP BY 1),
         |v AS (SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
         |      FROM (SELECT unnest(tk) AS t FROM tk)),
         |m AS (
         |  SELECT ex.doc_id,
         |    CAST(round(1e6 * ln((c2.c2 + 1.0) / (c1.c1 + v.v))) AS BIGINT) AS mm
         |  FROM ex JOIN c2 ON ex.b = c2.b
         |  JOIN c1 ON split_part(ex.b, ' ', 1) = c1.w1 CROSS JOIN v),
         |s AS (SELECT doc_id, CAST(SUM(mm) AS BIGINT) AS lp FROM m GROUP BY doc_id)
         |SELECT n.doc_id, n.n_bigrams, COALESCE(s.lp, 0) AS logprob_micro
         |FROM n LEFT JOIN s ON n.doc_id = s.doc_id
         |ORDER BY n.doc_id""".stripMargin,

// Same operation order as TextAnalytics.bm25Scores, term by term:
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5)); s = idf * ((tf*(k1+1))
    // / (tf + k1*(1 - b + b*(dl/avgdl)))); micro = round(1e6*s).
    "q64_bm25" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |st AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM tk),
         |tot AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
         |        FROM st),
         |ex AS (SELECT doc_id, unnest(tk) AS term FROM tk),
         |tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM ex
         |  WHERE term IN ('spark', 'join', 'vector', 'stream')
         |  GROUP BY doc_id, term),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |sc AS (
         |  SELECT tf.doc_id,
         |    CAST(round(1e6 * (ln(1.0 + (t.n - d.df + 0.5) / (d.df + 0.5)) *
         |      ((tf.tf * (1.2 + 1.0)) /
         |       (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (s.dl / t.avgdl))))))
         |      AS BIGINT) AS m
         |  FROM tf JOIN dfreq d ON tf.term = d.term
         |  JOIN st s ON tf.doc_id = s.doc_id CROSS JOIN tot t),
         |agg AS (SELECT doc_id, CAST(SUM(m) AS BIGINT) AS score
         |        FROM sc GROUP BY doc_id)
         |SELECT st.doc_id, st.dl AS n_tokens,
         |  COALESCE(agg.score, 0) AS score_micro
         |FROM st LEFT JOIN agg ON st.doc_id = agg.doc_id
         |ORDER BY st.doc_id""".stripMargin,

// Ground truth is the single global running-sum window DuckDB can
    // afford at oracle scale; the Spark side must reproduce it from
    // the distributed bucketed form value-for-value.
    "q62_pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
        |  FROM t)
        |SELECT id, n_tokens, "offset",
        |  CAST(COALESCE(CASE WHEN n_tokens > 0 THEN "offset" // 512 END, -1)
        |    AS BIGINT) AS start_chunk,
        |  CAST(COALESCE(CASE WHEN n_tokens > 0 THEN ("offset" + n_tokens - 1) // 512 END, -1)
        |    AS BIGINT) AS end_chunk
        |FROM c ORDER BY id""".stripMargin,

"q41_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS quartile,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  ROUND(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, drnk, o_orderkey""".stripMargin,

"q42_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

"q43_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

"q44_crossmodal_filter" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    ROUND(least(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) / 50.0, 1.0) * 0.4
         |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |          ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text) END) * 4.0) * 0.3
         |      + least((CASE WHEN len($toksLower) = 0 THEN 0.0
         |          ELSE len(list_filter($toksLower,
         |                 x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) * 1.0
         |               / len($toksLower) END) * 3.0, 1.0) * 0.3, 6) AS q
         |  FROM documents)
         |SELECT label, COUNT(*) AS n_docs,
         |  ROUND(CAST(SUM(CAST(q AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*), 6) AS avg_quality
         |FROM embeddings e JOIN q ON e.vec_id = q.doc_id
         |WHERE q.q >= 0.5
         |GROUP BY label ORDER BY label""".stripMargin,

"q36_asof_join" -> asofOracleSql,

// Same ground truth as q36 — the bucketed two-phase merge must be
    // observationally identical to the linear form.
    "q70_asof_bucketed" -> asofOracleSql)
}
