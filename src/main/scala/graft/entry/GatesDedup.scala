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

/** Gate registry, the dedup family (exact, MinHash/LSH, SimHash, semantic, spans) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8). Round 15: the
  * coded/persisted vector-store gates (SQ8/BQ ADC, IVF+SQ8 store
  * lifecycle, graph store search/index, embedding-store
  * semantic/drift) moved verbatim to [[GatesVectorStore]] (registry
  * growth watch: Dedup was at 1,628 lines; zero behavior change).
  */
private[graft] object GatesDedup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

"q15_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text").orderBy("fp")
    }),

// maxDf hot-shingle cap ACTIVE in the gate (the oracle applies the
    // same QUALIFY) — viral shingles are dropped from the inverted
    // index before the candidate join in both engines.
    "q16_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, tau = 0.5, maxDf = 1000)
        .orderBy("id_a", "id_b")
    }),

// Gate queries run the md5-portable hash mode so signature, banding
    // and pair verification are exactly replayed by the DuckDB oracle;
    // production default stays the xxhash64 codegen kernels (ScalaTest
    // asserts both modes implement the same algorithm).
    "q17_minhash_dedup" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, tau = 0.35,
        portableHash = true)
        .orderBy("id_a", "id_b")
    }),

"q18_simhash" -> ((s, dir) => {
      Dedup.simhashFingerprints(t(s, dir, "documents"), "doc_id", "text",
        portableHash = true)
        .orderBy("id")
    }),

// Duplicated-passage signal (substring-dedup metric): fraction of
    // each doc's 3-token windows (with multiplicity) occurring >= 2
    // times corpus-wide.
    "q57_duplicated_windows" -> ((s, dir) => {
      Dedup.duplicatedWindowFraction(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minDf = 2)
        .orderBy("doc_id")
    }),

// Span-level duplicated-passage removal (Lee et al. cut): 3-token
    // windows occurring >= 2 times corpus-wide are removed from every
    // doc except the globally-first occurrence (keepOne).
    "q59_remove_dup_spans" -> ((s, dir) => {
      Dedup.removeDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minDf = 2, keepOne = true)
        .orderBy("doc_id")
    }),

// Connected components on a deliberately DEEP graph: chain edges
    // (k, k-3) make three components of depth n/3 — far beyond any
    // fixed-round label propagation, trivial for the convergence-
    // checked star algorithm. The oracle is the closed-form ground
    // truth (components are residue classes mod 3, rep = class min).
    "q60_connected_components" -> ((s, dir) => {
      val pairs = t(s, dir, "customer").where(col("c_custkey") > 3)
        .select(col("c_custkey").as("id_a"), (col("c_custkey") - 3).as("id_b"))
      Dedup.canonicalizeCc(pairs).orderBy("id")
    }),

// Graph-clustered SemDeDup: the q19 exact pair set collapsed to
    // connected components by the star algorithm; the oracle computes
    // the SAME components via a recursive-CTE transitive closure — a
    // genuine cross-algorithm check (epsilon-GRAPH components, the
    // transitive alternative to q61's one-shot marking).
    "q66_semdedup_graph" -> ((s, dir) => {
      val pairs = Dedup.embeddingPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", tau = 0.45, planes = 0)
      Dedup.canonicalizeCc(pairs.select("id_a", "id_b")).orderBy("id")
    }),

// Cross-corpus decontamination: training docs (doc_id%10!=0) that
    // MinHash-band with any eval doc (doc_id%10==0) at est_jaccard >=
    // tau — md5-portable mode, replayed key-for-key by the oracle.
    "q58_decontam_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val evalDocs = docs.where(col("doc_id") % 10 === 0)
      val train = docs.where(col("doc_id") % 10 =!= 0)
      Dedup.minhashLshPairsAcross(train, "doc_id", "text",
        evalDocs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, tau = 0.35,
        portableHash = true)
        .orderBy("id_l", "id_r")
    }),

// The persisted-fingerprint incremental-dedup lifecycle under the
    // gate: build the store from one corpus slice, APPEND a second
    // slice, then probe a batch against the combined history — the
    // on-disk build-once/probe-many analog of q58's in-memory
    // cross-corpus pairs (same banding semantics, so the oracle is the
    // same replay with an even/odd split).
    "q82_minhash_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_mh_store").toString
      graft.operators.MinhashStore.write(
        docs.where(col("doc_id") % 4 === 0), "doc_id", "text", tmp,
        shingleN = 3, bands = 16, rowsPerBand = 4, portableHash = true)
      graft.operators.MinhashStore.append(
        docs.where(col("doc_id") % 4 === 2), "doc_id", "text", tmp)
      graft.operators.MinhashStore.probe(s, tmp,
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
        tau = 0.35, maxBucket = 1000)
        .orderBy("id_new", "id_store")
    }),

// The store MAINTENANCE lifecycle under the gate: build + append as
    // q82, then DELETE a slice (tombstones) and COMPACT (rewrite minus
    // tombstones, bucket_counts recounted in one shard) before probing.
    // The oracle is q82's replay with the deleted ids filtered out of
    // the banded universe — pairs AND hot-bucket accounting must both
    // behave as if the deleted docs were never ingested.
    "q97_store_compacted" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_mh_cmp").toString
      graft.operators.MinhashStore.write(
        docs.where(col("doc_id") % 4 === 0), "doc_id", "text", tmp,
        shingleN = 3, bands = 16, rowsPerBand = 4, portableHash = true)
      graft.operators.MinhashStore.append(
        docs.where(col("doc_id") % 4 === 2), "doc_id", "text", tmp)
      graft.operators.MinhashStore.delete(
        docs.where(col("doc_id") % 8 === 0).select("doc_id"), "doc_id", tmp)
      graft.operators.MinhashStore.compactStore(s, tmp)
      graft.operators.MinhashStore.probe(s, tmp,
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
        tau = 0.35, maxBucket = 1000)
        .orderBy("id_new", "id_store")
    }),

// WARC ingest round-trip under the gate: corpus → WARC shards
    // (Content-Length-framed response records, metadata as headers) →
    // record walk back (plus a planted garbage shard that must vanish)
    // → per-(lang, source) fidelity digest vs the original parquet —
    // the q83 JSONL posture for the web-crawl wire format.
    "q105_warc_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_warc").toString
      def warcCols(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("http://graft.test/doc/"), col("doc_id")).as("uri"),
        col("text").cast("binary").as("payload"),
        map(lit("X-Lang"), col("lang"),
            lit("X-Source"), col("source")).as("hdrs"))
      // evens travel as plain .warc; odds through GZIPPED shards (the
      // Common Crawl .warc.gz form — each shard one gzip stream here;
      // the concatenated-member case is spec'd in SourcesSpec). The
      // digest only matches the parquet oracle if BOTH paths decode.
      graft.sources.Warc.write(
        warcCols(docs.where(col("doc_id") % 2 === 0)),
        tmp, "uri", "payload", Some("hdrs"))
      val gzTmp = java.nio.file.Files.createTempDirectory("graft_warc_gz").toString
      graft.sources.Warc.write(
        warcCols(docs.where(col("doc_id") % 2 === 1)),
        gzTmp, "uri", "payload", Some("hdrs"))
      new java.io.File(gzTmp).listFiles().filter(_.getName.endsWith(".warc"))
        .foreach { f =>
          val out = new java.io.FileOutputStream(s"$tmp/gz-${f.getName}.gz")
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(java.nio.file.Files.readAllBytes(f.toPath))
          gz.close()
        }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$tmp/zz-corrupt.warc"),
        "garbage, not a warc record\r\n\r\n")
      graft.sources.Warc.read(s, tmp).toDF()
        .where(col("record_type") === "response")
        .select(col("headers")("X-Lang").as("lang"),
          col("headers")("X-Source").as("source"),
          col("payload").cast("string").as("text"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          min(md5(col("text").cast("binary"))).as("min_md5"))
        .orderBy("lang", "source")
    }),

// JSONL ingest round-trip under the gate: corpus → JSONL shards →
    // tolerant read (a deliberately malformed shard is planted — its
    // lines must vanish, not fail the job or skew the aggregate) →
    // per-(lang, source) fidelity digest. The md5-of-text MIN proves
    // the text column survived JSON escaping byte-for-byte; the oracle
    // reads the original parquet, so any round-trip corruption breaks
    // the value compare.
    "q83_jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      graft.sources.Jsonl.write(docs, tmp)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$tmp/zz-corrupt.json"),
        "{not json at all\n\"also broken\n{\"doc_id\": }\n")
      graft.sources.Jsonl.readClean(s, tmp, docs.schema)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min(md5(col("text").cast("binary"))).as("min_md5"))
        .orderBy("lang", "source")
    }),

// BPE tokenizer training under the gate: 8 merge rounds over the
    // corpus word-frequency table. The oracle unrolls the SAME
    // argmax + string-replace rounds as CTEs — an iterative trainer
    // replayed exactly, round for round (the driver loop is the Spark
    // side's only non-SQL element).
    "q85_bpe_train" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Bpe.train(t(s, dir, "documents"), "text", numMerges = 8)
        .toDF("step", "lhs", "rhs", "merged", "freq")
        .orderBy("step")
    }),

// BYTE-LEVEL BPE training (round 10 — the GPT-2 form production
    // tokenizers ship): words start from UTF-8 bytes remapped through
    // the fixed bytes_to_unicode bijection, so multibyte characters
    // decompose and no input is ever OOV. Same 8 merge rounds; the
    // oracle re-derives the byte alphabet with hex()+strpos parsing
    // and the CASE remap, then replays the identical rounds.
    "q327_bpe_bytes" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Bpe.train(t(s, dir, "documents"), "text",
          numMerges = 8, byteLevel = true)
        .toDF("step", "lhs", "rhs", "merged", "freq")
        .orderBy("step")
    }),

// Byte-level vocab TABLE (round 11, completing the GPT-2 artifact
    // lifecycle q327 trains): base symbols are the remapped bytes the
    // byte-level trainer starts from, lexically contiguous ids, merge
    // outputs appended in rank order — q115's contract on the byte
    // alphabet. The oracle re-derives the byte universe with the same
    // hex-parse + CASE remap as the training replay.
    "q331_bpe_vocab_bytes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8,
          byteLevel = true)
        .map(m => (m._2, m._3))
      graft.operators.Bpe.vocabTable(docs, "text", merges,
          byteLevel = true)
        .orderBy("id")
    }),

// Byte-level contiguous-id tokenization end-to-end (round 11):
    // a doc slice encoded through the byte vocab TABLE via the
    // byteLevel rank-map kernel; OOV impossible by construction
    // (byte alphabet ⊇ any input), so any -1 is a real bug.
    "q332_bpe_vocab_ids_bytes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8,
          byteLevel = true)
        .map(m => (m._2, m._3))
      val vocab = graft.operators.Bpe.vocabTable(docs, "text", merges,
          byteLevel = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // comma-joined for the driver's comparator (q27 precedent)
      docs.where(col("doc_id") % 9 === 6)
        .select(col("doc_id"),
          concat_ws(",", transform(
            graft.operators.Bpe.encodeIds(col("text"), merges, vocab,
              byteLevel = true),
            x => x.cast("string"))).as("token_ids"))
        .orderBy("doc_id")
    }),

// Train-then-tokenize end-to-end: the corpus tokenized with its
    // OWN learned merges; per-doc subword vs word counts. The oracle
    // joins the unrolled trainer's final vocabulary back to each doc.
    "q92_bpe_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      docs.where(col("doc_id") < 100)
        .select(col("doc_id"),
          size(graft.operators.Bpe.encodeColumn(col("text"), merges))
            .cast("long").as("n_bpe_tokens"),
          Text.tokenCount(col("text")).cast("long").as("n_words"))
        .orderBy("doc_id")
    }),

// The PRODUCTION tokenizer path under the gate: the same
    // train-then-tokenize as q92 but through the rank-map kernel
    // (Bpe.encodeColumnFast / BpeTokens) instead of the per-merge
    // unrolled replaces — the form that carries a 30k-merge vocabulary.
    // Same oracle family, different doc slice; a kernel/unrolled
    // divergence on any word breaks the value compare.
    "q98_bpe_kernel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", numMerges = 8)
        .map(m => (m._2, m._3))
      docs.where(col("doc_id") % 7 === 3)
        .select(col("doc_id"),
          size(graft.operators.Bpe.encodeColumnFast(col("text"), merges))
            .cast("long").as("n_bpe_tokens"),
          Text.tokenCount(col("text")).cast("long").as("n_words"))
        .orderBy("doc_id")
    }),

// Paragraph dedup + reassembly. The corpus has no multi-paragraph
    // docs, so the gate synthesizes them: every doc gets a second
    // paragraph — its decade-anchor's text — so each anchor paragraph
    // recurs 11× and only the globally-first copy (the anchor doc's
    // OWN first paragraph) survives.
    "q86_dedup_paragraphs" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val anchors = docs.select(col("doc_id").as("aid"), col("text").as("atext"))
      val pdocs = docs
        .withColumn("aid", col("doc_id") - pmod(col("doc_id"), lit(10)))
        .join(anchors, Seq("aid"))
        .select(col("doc_id").as("pid"),
          concat(col("text"), lit("\n\n"), col("atext")).as("text"))
      Dedup.dedupParagraphs(pdocs, "pid", "text").orderBy("pid")
    }),

// Canonical-URL dedup: four synthesized crawl variants of each
    // logical page (tracking params / http + trailing slash / HTTPS
    // shouting + :443 + fragment / bare) must collapse per page key.
    "q87_url_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val host = concat(lit("site"), pmod(col("doc_id"), lit(20)), lit(".example.com"))
      val path = concat(lit("/page/"), pmod(col("doc_id"), lit(50)))
      val url = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("https://www."), host, path, lit("/?utm_source=x&ref=y")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("http://"), host, path, lit("/")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          upper(concat(lit("https://"), host, lit(":443"), path)))
        .otherwise(concat(host, path, lit("#frag")))
      TextAnalytics.dedupByUrl(
        docs.select(col("doc_id"), url.as("url")), "doc_id", "url")
        .orderBy("url_canon")
    }),

// Compaction binning: exclusive-cumsum-div-target over (size DESC,
    // id) — the documents table stands in as the file manifest (one
    // row per file, metadata-scale; Layout.compact drives the same
    // rule against real directories in ScalaTest).
    "q88_compaction_plan" -> ((s, dir) => {
      operators.Layout.packBySize(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", targetBytes = 4000L)
        .orderBy("doc_id")
    }),

// ANALYZE-style one-pass column profile (nulls synthesized as in
    // q14 so n_null is non-trivial); min/max rendered as strings over
    // engine-portable column types.
    "q89_analyze_table" -> ((s, dir) => {
      val src = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_name")).as("c_name"),
        col("c_mktsegment"), col("c_nationkey"))
      KeyChecks.analyze(src,
        Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
        .orderBy("col_name")
    }),

"q19_embedding_dedup" -> ((s, dir) => {
      Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.45, planes = 0)
        .orderBy("id_a", "id_b")
    }),

// The scale path: hyperplane-LSH buckets first, cosine verify inside
    // buckets only — the shape that survives 100 TB (q19 is the recall
    // baseline). Two OR-amplified tables; the oracle replays the same
    // 2×8 seeded hyperplanes.
    "q45_embedding_lsh" -> ((s, dir) => {
      Dedup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.45, planes = 8, dim = 64, seed = 7L, tables = 2)
        .orderBy("id_a", "id_b")
    }),

// MULTI-PROBE hyperplane LSH under the gate (round 12, r11 verdict
    // ask #4): each vector also probes the buckets flipping its two
    // least-confident plane bits, so 2 tables reach the recall that
    // plain bucketing needs 4-8 tables for. The oracle recomputes
    // every per-plane dot (seqDotSql — the same sequential fold the
    // kernel runs), ranks planes by (|dot|, index), XOR-flips the
    // probe bits, and replays the asymmetric probe-vs-index join.
    "q339_lsh_multiprobe" -> ((s, dir) => {
      Dedup.embeddingPairsMultiProbe(t(s, dir, "embeddings"), "vec_id",
        "embedding", tau = 0.45, planes = 4, dim = 64, seed = 7L,
        tables = 2, probes = 2)
        .orderBy("id_a", "id_b")
    }),

// Cross-corpus multi-probe (round 12): the decontamination join
    // with the probing on the LEFT (eval) side only — the right
    // (training) corpus indexes at exact buckets and never amplifies.
    // Even ids probe against odd ids; the oracle replays the per-plane
    // dots, the left-side probe ranking, and the asymmetric join.
    "q342_lsh_multiprobe_across" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.embeddingPairsAcrossMultiProbe(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding",
        tau = 0.45, planes = 4, dim = 64, seed = 7L, tables = 2,
        probes = 2)
        .orderBy("id_l", "id_r")
    }),

// SemDeDup: IVF-cluster the embedding space, pair ONLY within a
    // cluster, mark dup iff a smaller-id cluster-mate has cosine >=
    // tau. Portable centroid hash so the oracle replays the pick,
    // the NearestCell assignment, the maxCell QUALIFY and the
    // epsilon-ball marking key-for-key.
    "q61_semantic_dedup" -> ((s, dir) => {
      Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        tau = 0.45, c = 16, maxCell = 1000, portableHash = true)
        .orderBy("id")
    }))

  val oracles: Map[String, String] = Map(

"q15_dedup_exact" ->
      s"""SELECT md5($normText) AS fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

"q16_ngram_jaccard" ->
      s"""$shinglesSql,
         |capped AS (
         |  SELECT * FROM ex QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000)
         |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)) AS jaccard
         |  FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh) p
         |WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

"q17_minhash_dedup" ->
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
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         any_value(a.sig) AS sig_a, any_value(b.sig) AS sig_b
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_a, id_b, est_jaccard FROM (
         |  SELECT id_a, id_b,
         |    ROUND(len(list_filter(range(1,65), i -> sig_a[i] = sig_b[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

"q57_duplicated_windows" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents),
         |wins AS (
         |  SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |    ELSE list_transform(range(1, len(tk) - 1),
         |                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) END) AS w
         |  FROM toks),
         |g AS (SELECT w, COUNT(*) AS c FROM wins GROUP BY w),
         |per AS (
         |  SELECT x.doc_id, COUNT(*) AS tot,
         |         SUM(CASE WHEN g.c >= 2 THEN 1 ELSE 0 END) AS dup
         |  FROM wins x JOIN g USING (w) GROUP BY x.doc_id)
         |SELECT doc_id, ROUND(dup * 1.0 / tot, 6) AS dup_frac
         |FROM per ORDER BY doc_id""".stripMargin,

// Span removal replay: windows with positions, per-window count +
    // first-occurrence exemption (row_number over (doc_id, pos)), and
    // the token rewrite as a list_filter with DuckDB's 1-BASED lambda
    // index (Spark's filter index is 0-based — hence i - 1).
    "q59_remove_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(COALESCE(text, ''), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |wins AS (
        |  SELECT doc_id, u.pos, u.w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - 1, 1)), i ->
        |      struct_pack(pos := i - 1, w := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS u
        |    FROM toks) x),
        |occ AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn,
        |    COUNT(*) OVER (PARTITION BY w) AS c
        |  FROM wins),
        |spans AS (
        |  SELECT doc_id, list(pos ORDER BY pos) AS starts
        |  FROM occ WHERE c >= 2 AND rn > 1 GROUP BY doc_id),
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

// Components via WITH RECURSIVE transitive closure — a different
    // algorithm than the Spark side's large-star/small-star, agreeing
    // on the fixpoint. Closure stays small: epsilon-graph components
    // at this tau are a handful of docs each.
    "q66_semdedup_graph" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45),
         |e AS (SELECT id_a AS u, id_b AS v FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |r(u, v) AS (
         |  SELECT u, v FROM e
         |  UNION
         |  SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |m AS (SELECT u AS id, LEAST(u, MIN(v)) AS rep FROM r GROUP BY u)
         |SELECT id, rep FROM m ORDER BY id""".stripMargin,

// Ground-truth oracle, not a replay: with chain edges (k, k-3) the
    // components are exactly the residue classes mod 3, so the
    // expected rep is the class minimum — a closed form the window MIN
    // computes directly.
    "q60_connected_components" ->
      """WITH ids AS (
        |  SELECT c_custkey AS id FROM customer WHERE c_custkey > 3
        |  UNION
        |  SELECT c_custkey - 3 FROM customer WHERE c_custkey > 3)
        |SELECT id, MIN(id) OVER (PARTITION BY id % 3) AS rep
        |FROM ids ORDER BY id""".stripMargin,

// Cross-corpus decontamination: same signature/banding replay as
    // q17, with the pair join split train-side × eval-side. The
    // hot-bucket QUALIFY runs over ALL banded rows (each doc bands on
    // exactly one side, so the union equals the full corpus banding —
    // key-for-key the operator's union cap).
    "q58_decontam_pairs" ->
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
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_l, id_r, est_jaccard FROM (
         |  SELECT id_l, id_r,
         |    ROUND(len(list_filter(range(1,65), i -> sig_l[i] = sig_r[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_l, id_r""".stripMargin,

// Store-probe replay: identical banding to q58, batch = odd ids
    // (left), store = even ids (right). The operator's hot-bucket cap
    // sums prebuilt store counts + batch counts, which equals the full
    // corpus banding count — key-for-key this QUALIFY.
    "q82_minhash_store" ->
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
         |  SELECT a.doc_id AS id_new, b.doc_id AS id_store,
         |         any_value(a.sig) AS sig_new, any_value(b.sig) AS sig_store
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_new, id_store, est_jaccard FROM (
         |  SELECT id_new, id_store,
         |    ROUND(len(list_filter(range(1,65), i -> sig_new[i] = sig_store[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_new, id_store""".stripMargin,

// q82's replay over the post-delete universe: doc_id % 8 = 0 rows
    // vanish from the banded CTE BEFORE the hot-bucket QUALIFY — after
    // compactStore the recounted bucket_counts must make the Spark
    // probe's cap accounting identical to a store that never held them.
    "q97_store_compacted" ->
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
         |  WHERE doc_id % 8 <> 0
         |  QUALIFY COUNT(*) OVER (PARTITION BY b, bucket) <= 1000),
         |pairs AS (
         |  SELECT a.doc_id AS id_new, b.doc_id AS id_store,
         |         any_value(a.sig) AS sig_new, any_value(b.sig) AS sig_store
         |  FROM banded a JOIN banded b
         |    ON a.b = b.b AND a.bucket = b.bucket
         |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_new, id_store, est_jaccard FROM (
         |  SELECT id_new, id_store,
         |    ROUND(len(list_filter(range(1,65), i -> sig_new[i] = sig_store[i])) / 64.0, 6) AS est_jaccard
         |  FROM pairs) p
         |WHERE est_jaccard >= 0.35
         |ORDER BY id_new, id_store""".stripMargin,

// Same fidelity-digest posture as q83, WARC framing instead of
    // JSON escaping; sum_chars recomputed from text on both sides.
    "q105_warc_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |  MIN(md5(text)) AS min_md5
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

// The oracle reads the ORIGINAL parquet — the Spark side must
    // round-trip through JSONL (plus planted garbage lines) and land on
    // identical values, digest included.
    "q83_jsonl_roundtrip" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(md5(text)) AS min_md5
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

"q85_bpe_train" -> bpeOracleSql(8),

"q327_bpe_bytes" -> bpeOracleSql(8, byteLevel = true),

// q115's vocab rebuild on the byte alphabet: the unrolled
    // byte-level trainer's base symbols (hex-parse + CASE remap) in
    // lexical order, then the 8 merge outputs in rank order.
    "q331_bpe_vocab_bytes" ->
      s"""${bpeRoundsCte(8, byteLevel = true)},
         |$bpeVocabCtesBytes
         |SELECT token, id
         |FROM (SELECT * FROM base UNION ALL SELECT * FROM mids) v
         |ORDER BY id""".stripMargin,

// q116's ordered per-doc reconstruction through the byte vocab:
    // final-round symstrs split per word, ids joined through the
    // rebuilt byte table, flattened in word order.
    "q332_bpe_vocab_ids_bytes" ->
      s"""${bpeRoundsCte(8, byteLevel = true)},
         |$bpeVocabCtesBytes,
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
         |          WHERE doc_id % 9 = 6) z) x),
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
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 9 = 6) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

"q92_bpe_tokens" -> bpeTokensOracleSql(8),

"q98_bpe_kernel" -> bpeTokensOracleSql(8, docFilter = "doc_id % 7 = 3"),

// Paragraph-dedup replay: same synthesized two-paragraph docs,
    // first-occurrence via row_number over (pid, pos), rewrite as the
    // 1-based list_filter twin of Spark's 0-based filter-by-index.
    "q86_dedup_paragraphs" ->
      """WITH pdocs AS (
        |  SELECT d.doc_id AS pid,
        |         d.text || chr(10) || chr(10) || a.text AS text
        |  FROM documents d
        |  JOIN documents a ON a.doc_id = d.doc_id - (d.doc_id % 10)),
        |sp AS (SELECT pid, string_split(text, chr(10) || chr(10)) AS ps FROM pdocs),
        |paras AS (
        |  SELECT pid, u.pos, u.para FROM (
        |    SELECT pid, unnest(list_transform(range(1, len(ps) + 1),
        |      i -> struct_pack(pos := i - 1, para := ps[i]))) AS u
        |    FROM sp) x),
        |occ AS (
        |  SELECT pid, pos,
        |         row_number() OVER (PARTITION BY md5(para) ORDER BY pid, pos) AS rn
        |  FROM paras),
        |drops AS (
        |  SELECT pid, list(pos ORDER BY pos) AS dr
        |  FROM occ WHERE rn > 1 GROUP BY pid)
        |SELECT sp.pid,
        |  COALESCE(array_to_string(CASE WHEN dr IS NULL THEN ps
        |    ELSE list_filter(ps, (x, i) -> NOT list_contains(dr, i - 1)) END,
        |    chr(10) || chr(10)), '') AS clean_text,
        |  CAST(len(ps) AS INT) AS n_paras,
        |  CAST(CASE WHEN dr IS NULL THEN 0 ELSE len(dr) END AS INT) AS n_removed
        |FROM sp LEFT JOIN drops USING (pid)
        |ORDER BY pid""".stripMargin,

// Canonical-URL replay: same synthesized variants, same ordered
    // replace chain (DuckDB regexp_replace is first-match-only, which
    // is exactly what these anchored patterns need).
    "q87_url_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'https://www.site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 50) || '/?utm_source=x&ref=y'
        |      WHEN 1 THEN 'http://site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 50) || '/'
        |      WHEN 2 THEN upper('https://site' || (doc_id % 20) || '.example.com:443/page/' || (doc_id % 50))
        |      ELSE 'site' || (doc_id % 20) || '.example.com/page/' || (doc_id % 50) || '#frag'
        |    END AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        replace(replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(trim(lower(url)), '#.*$', ''),
        |                '\?.*$', ''),
        |              '^https?://', ''),
        |            '^www\.', ''),
        |          ':80/', '/'), ':443/', '/'),
        |        ':(80|443)$', ''),
        |      '/+$', '') AS url_canon
        |  FROM raw)
        |SELECT url_canon, MIN(doc_id) AS doc_id, COUNT(*) AS n_dupes
        |FROM canon GROUP BY url_canon ORDER BY url_canon""".stripMargin,

"q88_compaction_plan" ->
      """SELECT doc_id, n_chars,
        |  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4000 AS BIGINT) AS bin
        |FROM documents ORDER BY doc_id""".stripMargin,

"q89_analyze_table" ->
      """WITH src AS (
        |  SELECT c_custkey,
        |         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS c_name,
        |         c_mktsegment, c_nationkey
        |  FROM customer),
        |long AS (
        |  SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
        |    CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT) AS n_null,
        |    CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
        |    CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(MAX(c_custkey) AS VARCHAR) AS max_val FROM src
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_name IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_name) AS BIGINT),
        |    CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM src
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_mktsegment IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
        |    CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM src
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(COUNT(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
        |    CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM src)
        |SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val
        |FROM long ORDER BY col_name""".stripMargin,

"q18_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split_regex($normText, ' '), x -> x <> '')) AS tok
         |  FROM documents),
         |h AS (SELECT doc_id, md5(tok) AS hx FROM toks),
         |votes AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN CAST(floor((strpos('0123456789abcdef', substr(hx, CAST(b // 4 AS INT) + 1, 1)) - 1)
         |                        / power(2, 3 - b % 4)) AS INT) % 2 = 1
         |             THEN 1 ELSE -1 END) AS v
         |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) bb
         |  GROUP BY doc_id, b),
         |nibbles AS (
         |  SELECT doc_id, CAST(b // 4 AS INT) AS ci,
         |    CAST(SUM(CASE WHEN v > 0 THEN power(2, 3 - b % 4) ELSE 0 END) AS INT) AS nib
         |  FROM votes GROUP BY doc_id, CAST(b // 4 AS INT)),
         |fp AS (
         |  SELECT doc_id, string_agg(substr('0123456789abcdef', nib + 1, 1), '' ORDER BY ci) AS simhash
         |  FROM nibbles GROUP BY doc_id)
         |SELECT d.doc_id AS id, COALESCE(fp.simhash, '0000000000000000') AS simhash
         |FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
         |ORDER BY id""".stripMargin,

"q19_embedding_dedup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cosine
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,

"q342_lsh_multiprobe_across" ->
      s"""WITH planes(t, i, plane) AS (VALUES
         |      ${hyperplanesSql(planes = 4, dim = 64, seed = 7L, tables = 2)}),
         |dl AS (
         |  SELECT e.vec_id AS id, p.t, p.i,
         |    ${seqDotSql("e.embedding", "p.plane", 64)} AS dot
         |  FROM embeddings e CROSS JOIN planes p WHERE e.vec_id % 2 = 0),
         |bkl AS (
         |  SELECT id, t,
         |    SUM(CASE WHEN dot >= 0 THEN CAST(power(2, i) AS BIGINT)
         |        ELSE 0 END) AS bucket
         |  FROM dl GROUP BY id, t),
         |prl AS (
         |  SELECT d.id, d.t,
         |    xor(b.bucket, CAST(power(2, d.i) AS BIGINT)) AS bucket,
         |    row_number() OVER (PARTITION BY d.id, d.t
         |      ORDER BY abs(d.dot) ASC, d.i ASC) AS rn
         |  FROM dl d JOIN bkl b ON b.id = d.id AND b.t = d.t),
         |probe AS (
         |  SELECT id, t, bucket FROM bkl
         |  UNION ALL SELECT id, t, bucket FROM prl WHERE rn <= 2),
         |bkr AS (
         |  SELECT e.vec_id AS id, p.t,
         |    SUM(CASE WHEN ${seqDotSql("e.embedding", "p.plane", 64)} >= 0
         |        THEN CAST(power(2, p.i) AS BIGINT) ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN planes p WHERE e.vec_id % 2 = 1
         |  GROUP BY e.vec_id, p.t),
         |cand AS (
         |  SELECT DISTINCT l.id AS id_l, r.id AS id_r
         |  FROM probe l JOIN bkr r ON l.t = r.t AND l.bucket = r.bucket)
         |SELECT c.id_l, c.id_r,
         |  ROUND(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.id_l
         |JOIN embeddings eb ON eb.vec_id = c.id_r
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
         |ORDER BY id_l, id_r""".stripMargin,

"q339_lsh_multiprobe" ->
      s"""WITH planes(t, i, plane) AS (VALUES
         |      ${hyperplanesSql(planes = 4, dim = 64, seed = 7L, tables = 2)}),
         |d AS (
         |  SELECT e.vec_id AS id, p.t, p.i,
         |    ${seqDotSql("e.embedding", "p.plane", 64)} AS dot
         |  FROM embeddings e CROSS JOIN planes p),
         |bk AS (
         |  SELECT id, t,
         |    SUM(CASE WHEN dot >= 0 THEN CAST(power(2, i) AS BIGINT)
         |        ELSE 0 END) AS bucket
         |  FROM d GROUP BY id, t),
         |pr AS (
         |  SELECT d.id, d.t,
         |    xor(bk.bucket, CAST(power(2, d.i) AS BIGINT)) AS bucket,
         |    row_number() OVER (PARTITION BY d.id, d.t
         |      ORDER BY abs(d.dot) ASC, d.i ASC) AS rn
         |  FROM d JOIN bk ON bk.id = d.id AND bk.t = d.t),
         |probe AS (
         |  SELECT id, t, bucket FROM bk
         |  UNION ALL SELECT id, t, bucket FROM pr WHERE rn <= 2),
         |cand AS (
         |  SELECT DISTINCT LEAST(p.id, b.id) AS id_a,
         |                  GREATEST(p.id, b.id) AS id_b
         |  FROM probe p JOIN bk b
         |    ON p.t = b.t AND p.bucket = b.bucket AND p.id <> b.id)
         |SELECT c.id_a, c.id_b,
         |  ROUND(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.id_a
         |JOIN embeddings eb ON eb.vec_id = c.id_b
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,

"q45_embedding_lsh" ->
      s"""WITH planes(t, i, plane) AS (VALUES
         |      ${hyperplanesSql(planes = 8, dim = 64, seed = 7L, tables = 2)}),
         |bucketed AS (
         |  SELECT e.vec_id, p.t,
         |    SUM(CASE WHEN ${seqDotSql("e.embedding", "p.plane", 64)} >= 0
         |        THEN CAST(power(2, p.i) AS BIGINT) ELSE 0 END) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, p.t),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bucketed a
         |  JOIN bucketed b ON a.t = b.t AND a.bucket = b.bucket
         |                 AND a.vec_id < b.vec_id)
         |SELECT c.id_a, c.id_b,
         |  ROUND(${cosSql("ea.embedding", "eb.embedding")}, 6) AS cosine
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.id_a
         |JOIN embeddings eb ON eb.vec_id = c.id_b
         |WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
         |ORDER BY id_a, id_b""".stripMargin,

// Replays the full SemDeDup chain: bottom-k centroid pick (same
    // md5 hash), NearestCell assignment (sim DESC, cell DESC
    // tie-break — the kernel's rule), hot-cell QUALIFY aligned with
    // the Spark maxCell anti-join, then the within-cluster
    // smaller-id epsilon-ball marking.
    "q61_semantic_dedup" ->
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
         |capped AS (
         |  SELECT * FROM cells
         |  QUALIFY COUNT(*) OVER (PARTITION BY cell) <= 1000),
         |dup AS (
         |  SELECT DISTINCT a.id
         |  FROM capped a JOIN capped b ON a.cell = b.cell AND b.id < a.id
         |  WHERE ${cosSql("a.vec", "b.vec")} >= 0.45)
         |SELECT c.id, c.cell, (d.id IS NOT NULL) AS is_dup
         |FROM cells c LEFT JOIN dup d ON c.id = d.id
         |ORDER BY c.id""".stripMargin)
}
