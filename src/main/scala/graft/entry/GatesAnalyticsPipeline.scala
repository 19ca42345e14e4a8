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

/** Gate registry, corpus-pipeline analytics (q104-q138: sampling,
  * mixtures, sketch stores, cleaners) — moved verbatim out of
  * GatesAnalyticsCore at round 13 (registry growth watch). Round 14:
  * the q139-q159 linkage / text-index / product-analytics block moved
  * verbatim to [[GatesProductAnalytics]] (Pipeline was at 1,906
  * lines; zero behavior change). SparkEntry concatenates the family
  * maps back into the driver contract.
  */
private[graft] object GatesAnalyticsPipeline {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

// LSH tuning harness under the gate: three bandings measured
    // against exact-Jaccard ground truth — candidate/truth/hit counts
    // and precision/recall per config, every number replayed (the
    // S-curve, measured rather than assumed).
    "q112_lsh_grid" -> ((s, dir) => {
      Dedup.lshGridEval(t(s, dir, "documents"), "doc_id", "text",
        tau = 0.35, configs = Seq((16, 4), (4, 16), (32, 2)),
        portableHash = true)
        .orderBy("bands", "rows_per_band")
    }),

// Grid → measure → PICK closed under the gate: the cheapest
    // banding whose measured recall meets 0.9 (min candidate volume);
    // the oracle re-ranks its own q112 replay the same way.
    "q118_lsh_pick" -> ((s, dir) => {
      Dedup.pickLshConfig(t(s, dir, "documents"), "doc_id", "text",
        tau = 0.35, configs = Seq((16, 4), (4, 16), (32, 2)),
        targetRecall = 0.9, portableHash = true)
    }),

// Vocab TABLE artifact: stable contiguous ids — base chars in
    // UTF8-lexical order, then merge outputs by rank (first surface
    // form wins) — the embedding-matrix-row contract q102's hashing
    // trick can't give. The oracle rebuilds the identical table from
    // the unrolled trainer CTEs.
    "q115_bpe_vocab" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      graft.operators.Bpe.vocabTable(docs, "text", merges)
        .orderBy("id")
    }),

// Contiguous-id tokenization end-to-end: a doc slice encoded
    // through the vocab TABLE (ids = embedding rows); OOV is
    // impossible by construction (the slice ⊆ the training corpus),
    // so any -1 in the output is a real bug the value compare catches.
    "q116_bpe_vocab_ids" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      val vocab = graft.operators.Bpe.vocabTable(docs, "text", merges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // comma-joined for the driver's comparator (q27 precedent); the
      // array form is exercised under ScalaTest.
      docs.where(col("doc_id") % 9 === 5)
        .select(col("doc_id"),
          concat_ws(",", transform(
            graft.operators.Bpe.encodeIds(col("text"), merges, vocab),
            x => x.cast("string"))).as("token_ids"))
        .orderBy("doc_id")
    }),

// Quality-ordered token budgets: each source's budget buys its
    // BEST tokens (score DESC, id) — score-range buckets from one
    // GK-quantile aggregate feed q107's two-phase prefix sum; the
    // oracle is the per-source single-window form that would
    // serialize each source at scale.
    "q117_token_budget_best" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.qualityScore(col("text")).as("score"))
      operators.Sampling.sampleTokenBudgetBest(d, "doc_id", "source",
        "n_tokens", "score", Map("src0" -> 500L, "src1" -> 0L),
        defaultBudget = 700L)
        .orderBy("doc_id")
    }),

// Asymmetric shingle CONTAINMENT (Broder's second resemblance
    // measure): |A∩B|/|A| — the truncated-mirror signal Jaccard
    // structurally misses; same inverted-index + df-cap plan as q16.
    "q119_containment" -> ((s, dir) => {
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, tau = 0.5)
        .orderBy("id_a", "id_b")
    }),

// C4's line/page heuristics value-exact: every predicate is a
    // plain string test (no regex), replayed verbatim in SQL.
    "q120_c4_clean" -> ((s, dir) => {
      operators.TextAnalytics.c4Clean(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

// HTML boilerplate strip: docs wrapped in a synthetic page
    // (style + script blocks, attributes, entities) must come back as
    // text — both engines run the IDENTICAL RE2-safe regex chain, so
    // the digest matches only if every stage agrees byte-for-byte.
    "q121_strip_html" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><style>body{color:red}</style></head><body><p class=\"t\">"),
        col("text"),
        lit("</p><script>var x = 1 &amp;&amp; 2;</script> &lt;done&gt;</body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          operators.TextAnalytics.stripHtml(html).as("clean"))
        .select(col("doc_id"),
          length(col("clean")).cast("long").as("n_clean"),
          md5(col("clean").cast("binary")).as("h_clean"))
        .orderBy("doc_id")
    }),

// Gopher's rule set in exact integer micro-units: every metric is
    // integer arithmetic over plain string tests, replayed verbatim.
    "q122_gopher_rules" -> ((s, dir) => {
      operators.TextAnalytics.gopherFilter(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

// Sliding-window chunker: 32-token windows, stride 24 → 1-4
    // chunks per 10-99-word doc; windows stop at the doc end.
    "q123_chunk_docs" -> ((s, dir) => {
      operators.TextAnalytics.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")
    }),

// Mojibake repair: docs with doc_id%3=0 get a suffix exercising
    // EVERY entry of the cp1252 repair table; both engines run a
    // replace chain generated from the same table.
    "q124_fix_mojibake" -> ((s, dir) => {
      val bad = operators.TextAnalytics.mojibakeTable.map(_._1).mkString(" ")
      val in = when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + bad)))
        .otherwise(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), in.as("txt"))
        .select(col("doc_id"),
          operators.TextAnalytics.mojibakeCount(col("txt")).as("n_bad"),
          operators.TextAnalytics.fixMojibake(col("txt")).as("clean"))
        .select(col("doc_id"), col("n_bad"),
          length(col("clean")).cast("long").as("len_clean"),
          md5(col("clean").cast("binary")).as("h_clean"))
        .orderBy("doc_id")
    }),

// Temperature-scaled mixture weights (n^0.5 smoothing): sqrt is
    // IEEE-exact in both engines, the normalizing sum is an ordered
    // fold, and micro outputs go through floor — value-exact doubles.
    "q125_temperature_mix" -> ((s, dir) => {
      operators.Sampling.temperatureWeights(t(s, dir, "documents"), "source",
        budgetDocs = 300L)
        .orderBy("source")
    }),

// Prototype pruning: drop the 30% most-central members of every
    // semantic cell (q61's cells); ranks replay exactly because the
    // sort key is round(cosine, 6) with id tiebreak in both engines.
    "q126_prototype_prune" -> ((s, dir) => {
      Dedup.prototypePrune(t(s, dir, "embeddings"), "vec_id", "embedding",
        c = 16, dropPermille = 300, portableHash = true)
        .orderBy("id")
    }),

// HLL vocabulary sketch: per-source register table + estimate,
    // replayed register-for-register (md5 60-bit hash, bin()-length
    // ranks, ordered power-of-two harmonic fold); exact distinct
    // rides along so the ~1.04/sqrt(m) accuracy is visible in-row.
    "q127_hll_distinct" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"), explode(Text.tokens(lower(col("text")))).as("tok"))
      val est = operators.TextAnalytics.hllEstimate(
        operators.TextAnalytics.hllRegisters(toks, "source", "tok", p = 10), p = 10)
      val exact = toks.groupBy(col("source").as("key"))
        .agg(count_distinct(col("tok")).as("n_exact"))
      est.join(exact, Seq("key"))
        .select(col("key").as("source"), col("n_regs"), col("est_floor"),
          col("n_exact"))
        .orderBy("source")
    }),

// Scalable exact percentile rank: two-phase bucketed form must
    // equal the single-window ground truth rank-for-rank (heavy ties
    // from integer token counts exercise the id tiebreak).
    "q128_rank_normalize" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("double").as("score"))
      operators.Sampling.rankNormalize(scored, "doc_id", "score", buckets = 16)
        .orderBy("doc_id")
    }),

// Rank-blend ensemble: two incomparable signals normalized to
    // exact percentiles, weighted 0.75/0.25 (FP-exact weights).
    "q129_blend_ranks" -> ((s, dir) => {
      val scored = t(s, dir, "documents").select(col("doc_id"),
        Text.tokenCount(col("text")).cast("double").as("n_tok"),
        length(col("text")).cast("double").as("n_chars"))
      operators.Sampling.blendRanks(scored, "doc_id",
        Seq("n_tok" -> 0.75, "n_chars" -> 0.25), buckets = 16)
        .orderBy("doc_id")
    }),

// Snapshot drift: today's simulated shard (rows dropped, names
    // nulled, a segment renamed) vs yesterday's — per-column deltas.
    "q130_stats_drift" -> ((s, dir) => {
      val cols = Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      val a = t(s, dir, "customer").select(cols.map(col): _*)
      val b = t(s, dir, "customer").where(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null))
            .otherwise(col("c_name")).as("c_name"),
          when(col("c_mktsegment") === "BUILDING", lit("ZBUILDING"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      operators.KeyChecks.statsDrift(a, b, cols).orderBy("col_name")
    }),

// HLL store lifecycle: two shards written independently, then
    // compacted — the merged estimate must equal the single-pass
    // sketch over the whole corpus (the oracle recomputes exactly
    // that; merge associativity is what's being gated).
    "q131_hll_store" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(Text.tokens(lower(col("text")))).as("tok"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_hll").toString
      operators.HllStore.write(
        toks.where(col("doc_id") % 2 === 0), "source", "tok", tmp, p = 10)
      operators.HllStore.append(
        toks.where(col("doc_id") % 2 === 1), "source", "tok", tmp)
      operators.HllStore.compactStore(s, tmp)
      operators.HllStore.estimate(s, tmp)
        .select(col("key").as("source"), col("n_regs"), col("est_floor"))
        .orderBy("source")
    }),

// CMS store lifecycle: two shards + compaction must equal the
    // single-pass sketch — counter linearity (cell-wise ADD) is the
    // thing gated; oracle is the q93 replay.
    "q132_cms_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_cms").toString
      operators.CmsStore.write(
        docs.where(col("doc_id") % 2 === 0), "text", tmp, d = 4, width = 512)
      operators.CmsStore.append(docs.where(col("doc_id") % 2 === 1), "text", tmp)
      operators.CmsStore.compactStore(s, tmp)
      operators.CmsStore.estimate(s, tmp,
        Seq("key", "agg", "table", "value", "spark", "window",
          "zzz_absent_term"))
        .orderBy("term")
    }),

// Exact stratified split: per-source 80/10/10 with EXACT floor
    // boundaries (splitById's hash-Bernoulli sizes wobble ±sqrt n).
    "q133_split_stratified" -> ((s, dir) => {
      operators.Sampling.splitStratified(t(s, dir, "documents"), "doc_id",
        "source", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    }),

// Key-skew report: top-10 heaviest l_suppkey values with integer
    // micro shares — the measure-before-you-salt signal.
    "q134_key_skew" -> ((s, dir) => {
      operators.KeyChecks.keySkew(t(s, dir, "lineitem"), "l_suppkey", topK = 10)
        .orderBy("rank")
    }),

// Robust median/MAD scaling in exact micro-units: med and MAD of
    // n_chars land on .0/.5 (integers in micro space), so the per-row
    // robust_micro is an exact integer DIV both engines replay.
    "q135_robust_scale" -> ((s, dir) => {
      operators.Sampling.robustScale(t(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

// Span-level decontamination excision: trigram needles from the
    // doc_id%50==0 "benchmark" subset cut matching spans out of the
    // rest of the corpus; docs survive minus the leaked passages.
    "q136_excise_passages" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.excisePassages(
        docs.where(col("doc_id") % 50 =!= 0), "doc_id", "text",
        docs.where(col("doc_id") % 50 === 0), "text", n = 3)
        .orderBy("doc_id")
    }),

// Embedding-space contrast report: per-label ordered-fold
    // centroids (the q46 fp-determinism trick), then pairwise centroid
    // cosine over the 10-label metadata frame.
    "q137_label_contrast" -> ((s, dir) => {
      operators.Knn.centroidContrast(
        operators.Knn.groupCentroids(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", dim = 64, ordered = true))
        .orderBy("grp_a", "grp_b")
    }),

// Portable Bloom decontamination: eval-slice bigrams fold into the
    // register-exact md5/double-hashing Bloom, train docs probe it in
    // one scan-shaped pass; the exact semi-join count rides along so
    // the gate also checks the no-false-negative direction (n_bloom >=
    // n_exact row by row). The filter is DELIBERATELY undersized
    // (2^12 bits vs the needle set's ~860·5 positions) so false
    // positives exist at sf0.01 (46 of them) — the gate then fails if
    // the probe is anything but this exact bit math (an exact join
    // would under-count n_bloom). Production sizing guidance lives in
    // the bloomBuild scaladoc.
    "q138_bloom_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mBits = 1 << 12
      val k = 5
      val needles = docs.where(col("doc_id") % 10 === 0)
        .select(explode(
          array_distinct(graft.plans.native.wordShingles(col("text"), 2)))
          .as("shingle"))
      val words = operators.TextAnalytics.bloomWords(
        operators.TextAnalytics.bloomBuild(needles, "shingle", mBits, k), mBits)
      val probes = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          array_distinct(graft.plans.native.wordShingles(col("text"), 2)).as("sh"))
      val flagged = probes.select(col("doc_id"),
        size(col("sh")).cast("long").as("n_sh"),
        size(filter(col("sh"), sh => operators.TextAnalytics
          .bloomMightContain(sh, words, mBits, k))).cast("long").as("n_bloom"))
      val exact = probes.select(col("doc_id"), explode(col("sh")).as("shingle"))
        .join(broadcast(needles.distinct()), Seq("shingle"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_exact"))
      flagged.join(exact, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"), col("n_bloom"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"))
        .orderBy("doc_id")
    }),

// One-call decontamination: q58's cross-corpus pairs as a REMOVAL —
    // train docs near-dup'ing any eval doc are anti-joined out; the
    // oracle replays the pairs then NOT-INs the leaked ids.
    "q110_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.decontaminate(
        docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text",
        docs.where(col("doc_id") % 10 === 0), "doc_id", "text",
        tau = 0.35, portableHash = true)
        .select("doc_id", "source").orderBy("doc_id")
    }),

// Unicode NFC under the gate: a decomposed combining-sequence
    // marker (chr-built in BOTH engines) is appended to every doc and
    // normalized — length and digest match only if Spark's JDK NFC and
    // DuckDB's nfc_normalize agree glyph-for-glyph.
    "q111_nfc_normalize" -> ((s, dir) => {
      val marker = " e\u0301a\u030Ao\u0302" // decomposed é å ô (NFC → éåô)
      val norm = Text.normalizeNfc(concat(col("text"), lit(marker)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          length(norm).cast("long").as("n_nfc"),
          md5(norm.cast("binary")).as("h_nfc"))
        .orderBy("doc_id")
    }),

// Upsampling mixture: weights past 1.0 repeat docs (floor copies +
    // hash-chosen fractional extras) — the "2.5 epochs of src2" half
    // of pretraining mixtures a keep/drop filter can't express.
    "q106_upsample_mixture" -> ((s, dir) => {
      operators.Sampling.upsampleMixture(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source",
        Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.5, "src3" -> 3.0))
        .orderBy("doc_id", "copy")
    }),

// Exact per-source token budgets: deterministic hash-order cut via
    // the two-phase prefix sum; the oracle is the single-window QUALIFY
    // form (which would serialize each source at scale).
    "q107_token_budget" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      operators.Sampling.sampleTokenBudget(d, "doc_id", "source",
        "n_tokens", Map("src0" -> 500L, "src1" -> 0L),
        defaultBudget = 1500L)
        .orderBy("doc_id")
    }),

// Best-k-per-key curation cut ("5 longest docs per source") via
    // bounded map-side heaps — the oracle's QUALIFY window shuffles the
    // whole corpus; the aggregator ships ≤k rows per key per partition.
    "q108_top_per_key" -> ((s, dir) => {
      operators.Sampling.topKPerKey(
        t(s, dir, "documents").select("source", "doc_id", "n_chars"),
        "source", "doc_id", "n_chars", k = 5)
        .orderBy("source", "rank")
    }),

// Curriculum staging: 4 difficulty bands by exact quartile
    // boundaries of n_chars, assignment a scan-side CASE over inlined
    // boundary literals (percentile ≡ quantile_cont — the q39 bridge).
    "q109_curriculum" -> ((s, dir) => {
      operators.Sampling.curriculumStages(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "n_chars", stages = 4, exact = true)
        .orderBy("doc_id")
    }),

// Leakage-free split: near-dup docs (q71's components) land on the
    // same side because the split hashes the component REP, not the
    // doc — the eval-contamination guard a per-doc split lacks.
    "q104_split_leakage_free" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, tau = 0.35,
        portableHash = true)
      val labels = Dedup.canonicalizeCc(pairs)
      operators.Sampling.splitLeakageFree(docs.select("doc_id", "source"),
        "doc_id", labels,
        Seq(("train", 80), ("val", 10), ("test", 10)))
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(

"q112_lsh_grid" -> lshGridOracleSql,

// The pick re-ranks the same measured grid: recall gate, then min
    // candidate volume (ties: bands, rows_per_band).
    "q118_lsh_pick" ->
      s"""SELECT * FROM (
         |$lshGridOracleSql
         |) g WHERE recall >= 0.9
         |ORDER BY n_candidates, bands, rows_per_band LIMIT 1""".stripMargin,

"q110_decontaminate" ->
      s"""$shinglesSql,
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
         |pairs AS (
         |  SELECT a.doc_id AS id_l, b.doc_id AS id_r,
         |         any_value(a.sig) AS sig_l, any_value(b.sig) AS sig_r
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
         |  GROUP BY a.doc_id, b.doc_id),
         |leaks AS (
         |  SELECT DISTINCT id_l FROM pairs
         |  WHERE len(list_filter(range(1,65), i -> sig_l[i] = sig_r[i])) / 64.0 >= 0.35)
         |SELECT d.doc_id, d.source FROM documents d
         |WHERE d.doc_id % 10 <> 0 AND d.doc_id NOT IN (SELECT id_l FROM leaks)
         |ORDER BY d.doc_id""".stripMargin,

// chr(769/778/770) are the combining acute/ring/circumflex — the
    // same decomposed marker the Spark side appends as \\u escapes.
    "q111_nfc_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    nfc_normalize(text || ' e' || chr(769) || 'a' || chr(778) || 'o' || chr(770)) AS t
        |  FROM documents)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_nfc, md5(t) AS h_nfc
        |FROM n ORDER BY doc_id""".stripMargin,

"q106_upsample_mixture" ->
      s"""SELECT * FROM (
         |  SELECT doc_id, source, unnest(range(n)) AS copy FROM (
         |    SELECT doc_id, source,
         |      CAST(FLOOR(w) AS BIGINT) +
         |      CASE WHEN CAST(h AS DOUBLE) < (w - FLOOR(w)) * 10000.0
         |           THEN 1 ELSE 0 END AS n
         |    FROM (
         |      SELECT doc_id, source,
         |        CASE source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.5
         |                    WHEN 'src2' THEN 2.5 WHEN 'src3' THEN 3.0
         |                    ELSE 1.0 END AS w,
         |        ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 10000 AS h
         |      FROM documents) x) y
         |  WHERE n > 0) z
         |ORDER BY doc_id, copy""".stripMargin,

"q107_token_budget" ->
      s"""SELECT source, doc_id, n_tokens FROM (
         |  SELECT source, doc_id, n_tokens,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 0
         |         ELSE 1500 END AS budget
         |  FROM (
         |    SELECT doc_id, source,
         |      CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |      ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} % 1000000 AS h
         |    FROM documents) x) y
         |WHERE cum < budget
         |ORDER BY doc_id""".stripMargin,

// (n_chars DESC, doc_id ASC) is a total order per source, so the
    // bounded-heap pick equals this window exactly.
    "q108_top_per_key" ->
      """SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS n_chars, rank FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rank
        |  FROM documents) x
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

"q109_curriculum" ->
      """WITH b AS (
        |  SELECT quantile_cont(CAST(n_chars AS DOUBLE), [0.25, 0.5, 0.75]) AS bs
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(CASE WHEN n_chars >= bs[1] THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= bs[2] THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= bs[3] THEN 1 ELSE 0 END AS INT) AS stage
        |FROM documents CROSS JOIN b
        |ORDER BY doc_id""".stripMargin,

// Rebuilds the contiguous-id vocab from the unrolled trainer:
    // distinct corpus characters in lexical order first, then the 8
    // merge outputs in rank order (a repeated surface form keeps its
    // min step — first occurrence wins, as in the Scala builder).
    "q115_bpe_vocab" ->
      s"""${bpeRoundsCte(8)},
         |$bpeVocabCtes
         |SELECT token, id
         |FROM (SELECT * FROM base UNION ALL SELECT * FROM mids) v
         |ORDER BY id""".stripMargin,

// q102's ordered per-doc reconstruction, but ids resolved through
    // the rebuilt vocab TABLE instead of the hashing trick.
    "q116_bpe_vocab_ids" ->
      s"""${bpeRoundsCte(8)},
         |$bpeVocabCtes,
         |voc AS (SELECT * FROM base UNION ALL SELECT * FROM mids),
         |vt AS (SELECT word,
         |         string_split(substr(symstr, 2, len(symstr) - 2),
         |                      chr(30)||chr(31)) AS toks
         |       FROM w8),
         |vt2 AS (
         |  SELECT word, u.j AS j, u.t AS tok FROM (
         |    SELECT word, unnest(list_transform(range(1, len(toks)+1),
         |             i -> struct_pack(j := i, t := toks[i]))) AS u
         |    FROM vt) x),
         |docw AS (
         |  SELECT doc_id, u.i AS wi, u.w AS word FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ws)+1),
         |             i -> struct_pack(i := i, w := ws[i]))) AS u
         |    FROM (SELECT doc_id, $toksLower AS ws FROM documents
         |          WHERE doc_id % 9 = 5) z) x),
         |wid AS (
         |  SELECT dw.doc_id, dw.wi, v2.j, v.id AS tid
         |  FROM docw dw JOIN vt2 v2 ON v2.word = dw.word
         |  JOIN voc v ON v.token = v2.tok),
         |agg1 AS (SELECT doc_id, wi, list(tid ORDER BY j) AS ids
         |         FROM wid GROUP BY doc_id, wi),
         |agg AS (SELECT doc_id, flatten(list(ids ORDER BY wi)) AS token_ids
         |        FROM agg1 GROUP BY doc_id)
         |SELECT d.doc_id,
         |  array_to_string(COALESCE(agg.token_ids, CAST([] AS BIGINT[])), ',')
         |    AS token_ids
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 9 = 5) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

// Ground truth is the per-source single quality-ordered window —
    // the Spark side must reproduce it from the score-range-bucketed
    // two-phase form value-for-value.
    "q117_token_budget_best" ->
      s"""WITH f AS (
         |  SELECT doc_id, source,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    ROUND(least(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) / 50.0, 1.0) * 0.4
         |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |          ELSE (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 / length(text) END) * 4.0) * 0.3
         |      + least((CASE WHEN len($toksLower) = 0 THEN 0.0
         |          ELSE len(list_filter($toksLower,
         |                 x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by'], x))) * 1.0
         |               / len($toksLower) END) * 3.0, 1.0) * 0.3, 6) AS score
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens, score,
         |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
         |    CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 0
         |         ELSE 700 END AS budget
         |  FROM f)
         |SELECT doc_id, source, n_tokens, score FROM c
         |WHERE cum < budget
         |ORDER BY doc_id""".stripMargin,

// Containment filters on the UNROUNDED ratio (as the Spark where
    // does) and emits the rounded value.
    "q119_containment" ->
      s"""$shinglesSql,
         |capped AS (
         |  SELECT * FROM ex QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         COUNT(*) * 1.0 / a.n_sh AS c_raw
         |  FROM capped a JOIN capped b
         |    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh)
         |SELECT id_a, id_b, ROUND(c_raw, 6) AS containment
         |FROM p WHERE c_raw >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

// Line predicates replayed verbatim; array_to_string([]) is NULL
    // in DuckDB where Spark's array_join is '' — COALESCE (q86/q59).
    "q120_c4_clean" ->
      """WITH l AS (
        |  SELECT doc_id, COALESCE(text, '') AS text,
        |         string_split(COALESCE(text, ''), chr(10)) AS lines
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, text, lines,
        |    list_transform(
        |      list_filter(lines, x ->
        |        right(trim(x), 1) IN ('.', '!', '?', '"')
        |        AND len(list_filter(string_split_regex(trim(x), '\s+'),
        |                            w -> w <> '')) >= 3
        |        AND NOT contains(lower(trim(x)), 'javascript')),
        |      x -> trim(x)) AS kept
        |  FROM l)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
        |  CAST(len(lines) AS INT) AS n_lines,
        |  CAST(len(kept) AS INT) AS n_kept,
        |  (len(kept) >= 5 AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{')) AS keep_doc
        |FROM k ORDER BY doc_id""".stripMargin,

// The identical RE2-safe chain: block-drop, tag-drop, the five
    // entities (amp LAST), whitespace collapse.
    "q121_strip_html" ->
      """SELECT doc_id,
        |  CAST(length(clean) AS BIGINT) AS n_clean,
        |  md5(clean) AS h_clean
        |FROM (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            '<html><head><style>body{color:red}</style></head><body><p class="t">'
        |              || text ||
        |              '</p><script>var x = 1 &amp;&amp; 2;</script> &lt;done&gt;</body></html>',
        |            '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
        |          '(?s)<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM documents) x
        |ORDER BY doc_id""".stripMargin,

// String-cast keys so ordering ties and output types align.
    "q134_key_skew" ->
      """WITH c AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM c),
        |r AS (
        |  SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        |    row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rank
        |  FROM c)
        |SELECT key, n_rows,
        |  CAST((n_rows * 1000000) // total AS BIGINT) AS share_micro,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r, t WHERE rank <= 10
        |ORDER BY rank""".stripMargin,

// Per-label ordered-fold centroids (the q46 cm-CTE replay) +
    // pairwise list_cosine_similarity over the label frame.
    "q137_label_contrast" ->
      """WITH cm AS (
        |  SELECT label AS grp, d,
        |    list_reduce(list(CAST(embedding[d] AS DOUBLE) ORDER BY vec_id), (a, b) -> a + b)
        |      / COUNT(*) AS mu,
        |    COUNT(*) AS n
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
        |  GROUP BY label, d),
        |cents AS (
        |  SELECT grp, CAST(MIN(n) AS BIGINT) AS n, list(mu ORDER BY d) AS cvec
        |  FROM cm GROUP BY grp)
        |SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b,
        |  ROUND(list_cosine_similarity(a.cvec, b.cvec), 6) AS cos
        |FROM cents a JOIN cents b ON a.grp < b.grp
        |ORDER BY grp_a, grp_b""".stripMargin,

// Replays the Bloom bit math position-for-position: h1/odd-stride
    // double hashing from the shared 60-bit md5 hash, membership =
    // all 5 probe positions present in the needle position set.
    "q138_bloom_decontam" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksLower AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
         |      ELSE list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END) AS bg
         |  FROM toks),
         |needles AS (
         |  SELECT DISTINCT unnest(bg) AS shingle FROM bg WHERE doc_id % 10 = 0),
         |nh AS (SELECT ${md5Hash64Sql("shingle")} AS h FROM needles),
         |npos AS (
         |  SELECT DISTINCT ((h % 1073741824) +
         |    i * ((h // 1073741824) - (h // 1073741824) % 2 + 1)) % 4096 AS p
         |  FROM nh CROSS JOIN (SELECT unnest(range(0, 5)) AS i) ii),
         |ex AS (SELECT doc_id, len(bg) AS n_sh, unnest(bg) AS shingle
         |       FROM bg WHERE doc_id % 10 <> 0),
         |ph AS (SELECT doc_id, shingle, ${md5Hash64Sql("shingle")} AS h FROM ex),
         |pp AS (
         |  SELECT doc_id, shingle,
         |    ((h % 1073741824) +
         |     i * ((h // 1073741824) - (h // 1073741824) % 2 + 1)) % 4096 AS p
         |  FROM ph CROSS JOIN (SELECT unnest(range(0, 5)) AS i) ii),
         |shing AS (
         |  SELECT doc_id, shingle, COUNT(np.p) AS nset
         |  FROM pp LEFT JOIN npos np ON pp.p = np.p
         |  GROUP BY doc_id, shingle),
         |bh AS (SELECT doc_id, CAST(COUNT(*) FILTER (WHERE nset = 5) AS BIGINT) AS n_bloom
         |       FROM shing GROUP BY doc_id),
         |exact AS (
         |  SELECT e.doc_id, CAST(COUNT(n.shingle) AS BIGINT) AS n_exact
         |  FROM ex e LEFT JOIN needles n ON e.shingle = n.shingle
         |  GROUP BY e.doc_id),
         |base AS (SELECT doc_id, CAST(any_value(n_sh) AS BIGINT) AS n_sh
         |         FROM ex GROUP BY doc_id)
         |SELECT b.doc_id, b.n_sh, COALESCE(bh.n_bloom, 0) AS n_bloom, exact.n_exact
         |FROM base b JOIN exact USING (doc_id) LEFT JOIN bh USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

// Median and MAD of integers land on .0/.5 — exact doubles both
    // engines rescale to the SAME micro longs; the row expression is
    // then pure integer arithmetic (div = // : both truncate to zero).
    "q135_robust_scale" ->
      """WITH m AS (
        |  SELECT CAST(round(quantile_cont(CAST(n_chars AS BIGINT), 0.5) * 1000000) AS BIGINT) AS med
        |  FROM documents),
        |d AS (
        |  SELECT CAST(round(quantile_cont(abs(CAST(n_chars AS BIGINT) * 1000000 - m.med), 0.5)) AS BIGINT) AS mad
        |  FROM documents, m)
        |SELECT doc_id, n_chars,
        |  CAST(((CAST(n_chars AS BIGINT) * 1000000 - m.med) * 1000000)
        |       // greatest(1, d.mad) AS BIGINT) AS robust_micro
        |FROM documents, m, d ORDER BY doc_id""".stripMargin,

// q59's window/rewrite replay with the count filter swapped for a
    // needle-gram semi-join: spans come from trigrams of the benchmark
    // subset, the rewrite HOF is identical.
    "q136_excise_passages" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id % 50 <> 0),
        |wins AS (
        |  SELECT doc_id, u.pos, u.w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)), i ->
        |      struct_pack(pos := i - 1, w := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS u
        |    FROM toks) x),
        |ntoks AS (
        |  SELECT list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS tk
        |  FROM documents WHERE doc_id % 50 = 0),
        |grams AS (
        |  SELECT DISTINCT u.w FROM (
        |    SELECT unnest(list_transform(range(1, greatest(len(tk) - 1, 1)), i ->
        |      struct_pack(pos := i - 1, w := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS u
        |    FROM ntoks) x),
        |spans AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS starts
        |  FROM wins WHERE w IN (SELECT w FROM grams) GROUP BY doc_id),
        |joined AS (
        |  SELECT t.doc_id, t.tk, s.starts FROM toks t
        |  LEFT JOIN spans s ON t.doc_id = s.doc_id),
        |kept AS (
        |  SELECT doc_id, tk,
        |    CASE WHEN starts IS NULL THEN tk
        |         ELSE list_filter(tk, (x, i) ->
        |           NOT len(list_filter(starts, ss -> i - 1 >= ss AND i - 1 <= ss + 2)) > 0)
        |    END AS kp
        |  FROM joined)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kp, ' '), '') AS clean_text,
        |  CAST(len(tk) AS INT) AS n_tokens,
        |  CAST(len(tk) - len(kp) AS INT) AS n_removed
        |FROM kept ORDER BY doc_id""".stripMargin,

// Cut fractions rendered from the SAME Scala cumulative doubles
    // the operator folds (0.8 + 0.1 is not 0.9 in binary).
    "q133_split_stratified" -> {
      val cfs = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _).tail
      s"""WITH c AS (
         |  SELECT doc_id, source, ${md5Hash64Sql("CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |n AS (SELECT source, COUNT(*) AS ns FROM c GROUP BY source),
         |r AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC)
         |      AS rank
         |  FROM c)
         |SELECT r.doc_id, r.source,
         |  CASE WHEN rank <= floor(${cfs(0)} * ns) THEN 'train'
         |       WHEN rank <= floor(${cfs(1)} * ns) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r JOIN n USING (source)
         |ORDER BY doc_id""".stripMargin
    },

// Same fold order as blendRanks: (p1*w1 + p2*w2) / totalW, floor.
    "q129_blend_ranks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |         w -> w <> '')) AS DOUBLE) AS n_tok,
        |    CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents),
        |r1 AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY n_tok ASC, doc_id ASC) AS rank,
        |         COUNT(*) OVER () AS n FROM t),
        |p1 AS (SELECT doc_id, CAST(CASE WHEN n <= 1 THEN 0
        |         ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_n_tok
        |       FROM r1),
        |r2 AS (SELECT doc_id,
        |         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS rank,
        |         COUNT(*) OVER () AS n FROM t),
        |p2 AS (SELECT doc_id, CAST(CASE WHEN n <= 1 THEN 0
        |         ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_n_chars
        |       FROM r2)
        |SELECT p1.doc_id, pct_n_tok, pct_n_chars,
        |  CAST(floor((pct_n_tok * 0.75 + pct_n_chars * 0.25) / 1.0) AS BIGINT)
        |    AS blend_micro
        |FROM p1 JOIN p2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

// q89's analyze replayed per side, joined, deltas in SQL.
    "q130_stats_drift" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name, c_mktsegment, c_nationkey FROM customer),
        |b AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS c_name,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 'ZBUILDING'
        |         ELSE c_mktsegment END AS c_mktsegment,
        |    c_nationkey
        |  FROM customer WHERE c_custkey % 11 <> 0),
        |la AS (
        |  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM a
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |    CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM a
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM a
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM a),
        |lb AS (
        |  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM b
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |    CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM b
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM b
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM b)
        |SELECT la.col_name,
        |  la.n_rows AS n_rows_a, lb.n_rows AS n_rows_b,
        |  lb.n_rows - la.n_rows AS row_delta,
        |  la.n_null AS n_null_a, lb.n_null AS n_null_b,
        |  lb.n_null - la.n_null AS null_delta,
        |  la.n_distinct AS n_distinct_a, lb.n_distinct AS n_distinct_b,
        |  lb.n_distinct - la.n_distinct AS distinct_delta,
        |  NOT (lb.min_val IS NOT DISTINCT FROM la.min_val) AS min_changed,
        |  NOT (lb.max_val IS NOT DISTINCT FROM la.max_val) AS max_changed
        |FROM la JOIN lb USING (col_name)
        |ORDER BY col_name""".stripMargin,

// The oracle is the single-window form the operator replaces.
    "q128_rank_normalize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |         w -> w <> '')) AS DOUBLE) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, score,
        |    row_number() OVER (ORDER BY score ASC, doc_id ASC) AS rank,
        |    COUNT(*) OVER () AS n
        |  FROM t)
        |SELECT doc_id, score AS score_key, CAST(rank AS BIGINT) AS rank,
        |  CAST(CASE WHEN n <= 1 THEN 0
        |       ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_micro
        |FROM r ORDER BY doc_id""".stripMargin,

// Identical to the q127 replay minus the exact column: the store's
    // shard-merged registers must land on the single-pass sketch.
    "q131_hll_store" -> {
      val m = 1L << 10
      val am2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |             w -> w <> '')) AS tok
         |    FROM documents) x),
         |h AS (SELECT source, ${md5Hash64Sql("tok")} AS h FROM t),
         |rv AS (SELECT source, h % $m AS bucket, h // $m AS v FROM h),
         |rk AS (SELECT source, bucket,
         |         CASE WHEN v = 0 THEN 51 ELSE 51 - length(bin(v)) END AS rank
         |       FROM rv),
         |regs AS (SELECT source, bucket, MAX(rank) AS r
         |         FROM rk GROUP BY source, bucket),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |    list_reduce(list_transform(
         |      list_sort(list(struct_pack(bucket := bucket, r := r))),
         |      x -> power(2.0, -x.r)), (a, b) -> a + b) AS s
         |  FROM regs GROUP BY source)
         |SELECT source, n_regs,
         |  CAST(floor($am2 / (s + CAST($m - n_regs AS DOUBLE))) AS BIGINT)
         |    AS est_floor
         |FROM agg
         |ORDER BY source""".stripMargin
    },

// alpha·m² rendered from the SAME Scala double hllEstimate uses
    // (Double.toString round-trips); power(2,-r) terms are FP-exact.
    "q127_hll_distinct" -> {
      val m = 1L << 10
      val am2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
      s"""WITH t AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source,
         |      unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |             w -> w <> '')) AS tok
         |    FROM documents) x),
         |h AS (SELECT source, ${md5Hash64Sql("tok")} AS h FROM t),
         |rv AS (SELECT source, h % $m AS bucket, h // $m AS v FROM h),
         |rk AS (SELECT source, bucket,
         |         CASE WHEN v = 0 THEN 51 ELSE 51 - length(bin(v)) END AS rank
         |       FROM rv),
         |regs AS (SELECT source, bucket, MAX(rank) AS r
         |         FROM rk GROUP BY source, bucket),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_regs,
         |    list_reduce(list_transform(
         |      list_sort(list(struct_pack(bucket := bucket, r := r))),
         |      x -> power(2.0, -x.r)), (a, b) -> a + b) AS s
         |  FROM regs GROUP BY source),
         |ex AS (SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact
         |       FROM t GROUP BY source)
         |SELECT a.source, n_regs,
         |  CAST(floor($am2 / (s + CAST($m - n_regs AS DOUBLE))) AS BIGINT)
         |    AS est_floor,
         |  n_exact
         |FROM agg a JOIN ex USING (source)
         |ORDER BY source""".stripMargin
    },

"q126_prototype_prune" ->
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
         |ranked AS (
         |  SELECT ce.id, ce.cell,
         |    row_number() OVER (PARTITION BY ce.cell
         |      ORDER BY ROUND(${cosSql("ce.vec", "ct.cvec")}, 6) DESC, ce.id ASC)
         |      AS proto_rank,
         |    COUNT(*) OVER (PARTITION BY ce.cell) AS n_cell
         |  FROM cells ce JOIN cents ct ON ce.cell = ct.cell)
         |SELECT id, cell, CAST(proto_rank AS BIGINT) AS proto_rank,
         |  CAST(n_cell AS BIGINT) AS n_cell,
         |  proto_rank > (n_cell * 300) // 1000 AS keep
         |FROM ranked ORDER BY id""".stripMargin,

// 0.0-seeded fold == DuckDB's init-free list_reduce (x + 0.0 is
    // exact); both engines sum sqrt masses in source-sorted order.
    "q125_temperature_mix" ->
      """WITH c AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source),
        |s AS (
        |  SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS s FROM c),
        |t AS (
        |  SELECT list_reduce(
        |    list_transform(
        |      list_sort(list(struct_pack(source := source, s := s))),
        |      x -> x.s),
        |    (a, b) -> a + b) AS t
        |  FROM s)
        |SELECT source, n_docs,
        |  CAST(floor((s / t) * 1000000.0) AS BIGINT) AS weight_micro,
        |  CAST(floor(least(1.0, 300.0 * (s / t) / CAST(n_docs AS DOUBLE))
        |    * 1000000.0) AS BIGINT) AS rate_micro
        |FROM s, t ORDER BY source""".stripMargin,

// Replace chain + counts GENERATED from TextAnalytics.mojibakeTable
    // (the same object the Spark query folds over) — drift impossible.
    "q124_fix_mojibake" -> {
      val tbl = operators.TextAnalytics.mojibakeTable
      val badSuffix = tbl.map(_._1).mkString(" ")
      val chain = tbl.foldLeft("txt") { case (acc, (bad, good)) =>
        s"replace($acc, '$bad', '$good')" }
      val counts = tbl.map { case (bad, _) =>
        s"(length(txt) - length(replace(txt, '$bad', ''))) // ${bad.length}"
      }.mkString("\n      + ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text || ' $badSuffix'
         |         ELSE text END AS txt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST($counts AS BIGINT) AS n_bad,
         |  CAST(length($chain) AS BIGINT) AS len_clean,
         |  md5($chain) AS h_clean
         |FROM t ORDER BY doc_id""".stripMargin
    },

// range(0, stop, step) is end-EXCLUSIVE in DuckDB where Spark's
    // sequence is inclusive — the stop is (n_chunks-1)*stride + 1.
    // list_slice is 1-based inclusive-both-ends and clamps, matching
    // Spark's slice(toks, off+1, len) at the tail.
    "q123_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
        |                w -> w <> '') AS toks
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        |    1 + (CASE WHEN len(toks) > 32 THEN len(toks) - 32 ELSE 0 END + 23) // 24
        |      AS n_chunks
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |  CAST(off // 24 AS BIGINT) AS chunk_idx,
        |  CAST(least(32, n - off) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, off + 1, off + 32), ' ') AS chunk_text
        |FROM n, UNNEST(range(0, CAST((n_chunks - 1) * 24 + 1 AS BIGINT), 24)) AS u(off)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

// Integer micro-unit DIVs throughout (// in DuckDB, div in Spark —
    // identical truncation on the non-negative operands here).
    "q122_gopher_rules" ->
      """WITH b AS (
        |  SELECT doc_id, COALESCE(text, '') AS text,
        |    list_filter(string_split_regex(trim(COALESCE(text, '')), '\s+'),
        |                w -> w <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, toks,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
        |         AS BIGINT) AS sum_len,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + (length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_sym,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
        |         AS BIGINT) AS alpha_w,
        |    CAST(len(list_intersect(
        |      list_distinct(list_transform(toks, w -> lower(w))),
        |      ['the','be','to','of','and','that','have','with'])) AS BIGINT)
        |      AS required_hits,
        |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
        |                l -> l <> '') AS lines
        |  FROM b),
        |d AS (
        |  SELECT doc_id, n_words, sum_len, n_sym, alpha_w, required_hits,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> left(l, 1) IN ('-', '*', '•')))
        |         AS BIGINT) AS bullet_l,
        |    CAST(len(list_filter(lines, l -> right(l, 3) = '...' OR right(l, 1) = '…'))
        |         AS BIGINT) AS ell_l,
        |    CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS dup_l
        |  FROM c),
        |m AS (
        |  SELECT doc_id, n_words,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (sum_len * 1000000) // n_words END AS mean_len_micro,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (n_sym * 1000000) // n_words END AS symbol_micro,
        |    CASE WHEN n_lines = 0 THEN 0 ELSE (bullet_l * 1000000) // n_lines END AS bullet_micro,
        |    CASE WHEN n_lines = 0 THEN 0 ELSE (ell_l * 1000000) // n_lines END AS ellipsis_micro,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (alpha_w * 1000000) // n_words END AS alpha_micro,
        |    required_hits,
        |    CASE WHEN n_lines = 0 THEN 0 ELSE (dup_l * 1000000) // n_lines END AS dup_line_micro
        |  FROM d)
        |SELECT doc_id, n_words, mean_len_micro, symbol_micro, bullet_micro,
        |  ellipsis_micro, alpha_micro, required_hits, dup_line_micro,
        |  (n_words BETWEEN 50 AND 100000
        |    AND mean_len_micro BETWEEN 3000000 AND 10000000
        |    AND symbol_micro <= 100000 AND bullet_micro < 900000
        |    AND ellipsis_micro < 300000 AND alpha_micro >= 800000
        |    AND required_hits >= 2 AND dup_line_micro <= 300000) AS keep_doc
        |FROM m ORDER BY doc_id""".stripMargin,

"q104_split_leakage_free" ->
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
         |SELECT doc_id, source,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT d.doc_id, d.source,
         |    ${md5Hash64Sql("CAST(COALESCE(m2.rep, d.doc_id) AS VARCHAR)")} % 100 AS b
         |  FROM documents d LEFT JOIN m2 ON m2.id = d.doc_id) x
         |ORDER BY doc_id""".stripMargin,

// The store's shard-summed cells must land on the single-pass
    // q93 replay verbatim.
    "q132_cms_store" ->
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
         |GROUP BY term ORDER BY term""".stripMargin)
}
