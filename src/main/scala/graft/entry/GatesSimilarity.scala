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

/** Gate registry, ANN / similarity search (brute force, IVF ladder, graph, PQ) — split verbatim out of
  * SparkEntry.scala (round 10, r9 verdict ask #8). Round 15: the
  * retrieval-ladder gates (late interaction, MMR, PLAID MaxSim,
  * ColBERT candidates, retrieval eval metrics) moved verbatim to
  * [[GatesRetrieval]] (registry growth watch: Similarity was at
  * 1,584 lines; zero behavior change).
  */
private[graft] object GatesSimilarity {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

"q20_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      Knn.bruteForce(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// Oracle-replayable IVF: portable centroid hash, no Lloyd rounds —
    // centroid pick, cell assignment, probing and top-k all verified
    // value-exact in DuckDB. The k-means-refined path is q46.
    "q21_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      Knn.ivf(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, c = 16, nprobe = 4, refineIters = 0, portableHash = true)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// Corpus-wide kNN graph: every embedding is a query; per-row cell
    // probe (in-row struct sort over the collected centroids), cell
    // join co-keyed — never a corpus broadcast.
    "q65_knn_graph" -> ((s, dir) => {
      Knn.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, c = 16, nprobe = 2, portableHash = true)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// The SQL surface under the gate: the injected functions answer a
    // pure-SQL query (registration path + kernel semantics together).
    "q73_sql_surface" -> ((s, dir) => {
      GraftExtensions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("g_emb")
      t(s, dir, "documents").createOrReplaceTempView("g_docs")
      s.sql("""
        SELECT d.doc_id,
               size(word_shingles(d.text, 3)) AS n_shingles,
               ROUND(cosine_sim(e.embedding, e.embedding), 6) AS self_sim
        FROM g_docs d JOIN g_emb e ON d.doc_id = e.vec_id
        ORDER BY d.doc_id""")
    }),

// DELETE/COMPACT lifecycle for the persisted IVF store (round 14,
    // r13 verdict ask #1 — the family's last missing lifecycle leg,
    // now that IVF is the filtered-search workhorse): build, tombstone
    // the %7==3 residue class, search (a deleted id must never eat a
    // rank slot — the pre-top-k anti-join), bucket-pruned compact,
    // search again: the two phases must be IDENTICAL, which is the
    // lifecycle contract. The oracle replays q72's probe chain over
    // the survivors, once per phase.
    "q350_ivf_delete_compact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ivfdel_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16,
        portableHash = true)
      Knn.deleteFromIvfIndex(emb.where(col("vec_id") % 7 === 3),
        "vec_id", tmp)
      val qs = emb.where(col("vec_id") % 100 === 0)
      def probe() = Knn.searchIvf(s, tmp, qs, "vec_id", "embedding",
        k = 5, nprobe = 4)
        .select("query_id", "neighbor_id", "sim", "rank")
      // materialize the tombstoned-phase answer BEFORE compaction
      // rewrites the directories (and drops the tombstone table) the
      // lazy plan would otherwise read post-rewrite
      val tombstoned = probe().localCheckpoint(true)
      Knn.compactIvfStore(s, tmp)
      tombstoned.withColumn("phase", lit("tombstoned"))
        .unionByName(probe().withColumn("phase", lit("compacted")))
        .orderBy("phase", "query_id", "rank")
    }),

// IVF+RQ APPEND lifecycle (round 14 — closes the one append gap in
    // the IVF family): two-level books + centroids trained on the 80%
    // build slice, the held-out %5==4 slice appended THROUGH THE
    // STORED BOOKS (deterministic re-encode, the q344 discipline),
    // then the interleaved ADC probe over the merged store. The oracle
    // is q76's chain with the training CTEs scoped to the build slice
    // and encode/assignment over everything.
    "q352_ivfrq_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ivfrqapp_gate").toString
      Pq.writeIvfRqIndex(emb.where(col("vec_id") % 5 =!= 4),
        "vec_id", "embedding", tmp, c = 16, m = 8, k = 16, dim = 64,
        portableHash = true)
      Pq.appendIvfRqIndex(emb.where(col("vec_id") % 5 === 4),
        "vec_id", "embedding", tmp)
      Pq.searchIvfRq(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// IVF store MAINTENANCE STATS (round 14): the compaction/rebuild
    // policy's input — per-cell live row counts and tombstone backlog
    // from one column-pruned (id, cell) scan, no vectors read. The
    // oracle replays the assignment chain and counts the same way.
    "q358_ivf_store_stats" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ivfstat_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16,
        portableHash = true)
      Knn.deleteFromIvfIndex(emb.where(col("vec_id") % 7 === 3),
        "vec_id", tmp)
      Knn.ivfStoreStats(s, tmp).orderBy("cell")
    }),

// The persisted-index lifecycle under the gate: build the
    // cell-partitioned IVF index on disk, then answer through the
    // directory-pruned probe path — results must equal the in-memory
    // IVF (q21's oracle verbatim).
    "q72_ivf_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16, portableHash = true)
      Knn.searchIvf(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// FILTERED vector search (round 13): the metadata-predicate + kNN
    // combination — the store built with keep=Seq("label") co-locates
    // the attribute inside the cell directories, and the predicate
    // (label % 3 = 1) evaluates on the pruned cell scan BEFORE any
    // scoring, so filtered-out rows never eat a rank slot. The oracle
    // replays the q72 probe chain with the label carried through and
    // the same pre-rank WHERE.
    "q345_ivf_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ivff_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16,
        portableHash = true, keep = Seq("label"))
      Knn.searchIvfFiltered(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, pred = col("label") % 3 === 1,
        nprobe = 4)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// RANGE search (round 13): every neighbor at 6-dp cosine >= tau
    // among the probed cells, no top-k cap — the "all near-duplicates
    // of these probes" index query. Output unique on (query_id,
    // neighbor_id); the oracle replays the probe chain with the
    // threshold instead of the rank cap.
    "q346_ivf_range" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ivfr_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16,
        portableHash = true)
      Knn.searchIvfRange(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", tau = 0.25, nprobe = 4)
        .orderBy("query_id", "neighbor_id")
    }),

// The WHOLE on-disk IVF+PQ lifecycle under the gate: data-sampled
    // codebooks (bottom-k md5 — deterministic and SQL-replayable),
    // portable centroid pick, cell-partitioned build, then the
    // codes-only ADC probe + shortlist + exact re-rank.
    "q75_ivfpq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_gate").toString
      Pq.writeIvfPqIndex(emb, "vec_id", "embedding", tmp,
        c = 16, m = 8, k = 16, dim = 64, portableHash = true)
      Pq.searchIvfPq(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// The on-disk IVF+RQ twin of q75: level-1 books from the bottom-32
    // md5 rows' first half, level-2 books the HOLDOUT half's residuals
    // vs their level-1 argmin — all closed-form from data, replayed in
    // SQL; probe through interleaved two-level ADC + re-rank.
    "q76_ivfrq_persisted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfrq_gate").toString
      Pq.writeIvfRqIndex(emb, "vec_id", "embedding", tmp,
        c = 16, m = 8, k = 16, dim = 64, portableHash = true)
      Pq.searchIvfRq(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 5, nprobe = 4, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// K-means-refined IVF, oracle mode: one Lloyd round with the
    // ordered-fold per-cell mean (bit-identical to DuckDB's
    // list_reduce over id-sorted members). The production parallel
    // aggregator path stays spec-covered in KnnSpec.
    "q46_knn_ivf_refined" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      Knn.ivf(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
        k = 5, c = 16, nprobe = 4, refineIters = 1,
        portableHash = true, dim = 64)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// PQ gate query: seeded gaussian codebooks inlined as literals in
    // BOTH engines (the q45 hyperplane trick — encode/ADC/re-rank
    // correctness doesn't depend on codebook quality, and the
    // data-sampled production training stays spec-covered in PqSpec).
    // Exercises Pq.encode (argmin-L2 codes) + Pq.search (ADC table
    // lookup, bounded-TopK shortlist, exact cosine re-rank).
    "q51_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val books = pqBooks(m = 8, k = 16, subDim = 8, seed = 13L)
      val queries = emb.where(col("vec_id") % 100 === 0)
      val encoded = Pq.encode(emb, "vec_id", "embedding", books)
      Pq.search(encoded, queries, "vec_id", "embedding", books,
        k = 5, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// Residual-quantization gate query (round-4 twin of q51): seeded
    // two-level codebooks inlined as literals in BOTH engines; exercises
    // Pq.encodeResidual (interleaved level-1 argmin + residual argmin
    // codes) and Pq.searchResidual (interleaved dot tables through the
    // same AdcScore kernel, bounded-TopK shortlist, exact re-rank). The
    // data-trained residual path stays spec-covered in PqSpec.
    "q53_rq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val b1 = pqBooks(m = 8, k = 16, subDim = 8, seed = 13L)
      val b2 = pqBooks(m = 8, k = 16, subDim = 8, seed = 29L)
      val queries = emb.where(col("vec_id") % 100 === 0)
      val encoded = Pq.encodeResidual(emb, "vec_id", "embedding", b1, b2)
      Pq.searchResidual(encoded, queries, "vec_id", "embedding", b1, b2,
        k = 5, shortlist = 50)
        .select("query_id", "neighbor_id", "sim", "rank")
        .orderBy("query_id", "rank")
    }),

// One ordered-fold Lloyd round over the md5-sampled codebooks —
    // the DuckDB-replayable twin of trainCodebooksKmeans (whose
    // parallel VectorAvgAggregator cannot be fp-replayed; it stays
    // spec-covered by the distortion-decrease spec). Output is the
    // refined codebook components themselves, flat (s, code, d, mu).
    "q55_pq_kmeans_ordered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val books = Pq.trainCodebooks(emb, "vec_id", "embedding",
        m = 8, k = 16, dim = 64)
      Pq.refineCodebooksOrdered(emb, "vec_id", "embedding", books)
        .orderBy("s", "code", "d")
    }),

// Effective-dated range join (AsOfJoin.rangeJoin): orders matched
    // to the epoch interval [start, end) containing their date; NULL
    // end = open-ended, customers %3==0 carry no intervals (left-join
    // null path). The dimension side is broadcast-scale by design.
    "q52_range_join" -> ((s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
      val epochs = t(s, dir, "customer")
        .where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"))
        .crossJoin(Seq(("1995-01-01", "1998-01-01", "early"),
            ("1998-01-01", null, "late"))
          .toDF("s", "e", "epoch")
          .select(to_date(col("s")).as("start_date"),
            to_date(col("e")).as("end_date"), col("epoch")))
      operators.AsOfJoin.rangeJoin(orders, "o_custkey", "o_date",
        epochs, "c_custkey", "start_date", "end_date")
        .select("o_orderkey", "o_custkey", "o_date", "epoch")
        .orderBy("o_orderkey")
    }),

// Items.definitionsAt end-to-end: effective-dated item metadata
    // (item_details-shaped dimension, non-overlapping epochs per item,
    // one item with no definitions → left-join null path) resolved for
    // each fact date through the broadcast range join. The dimension is
    // a literal here because the reference ships it as package data the
    // sandbox cannot carry (SURVEY known gap #1); the operator under
    // test is the full definitionsAt path.
    "q56_item_definitions" -> ((s, dir) => {
      import s.implicits._
      val facts = t(s, dir, "orders").select(
        col("o_orderkey"),
        concat(lit("RCON"), (pmod(col("o_orderkey"), lit(4)) + 2170).cast("string"))
          .as("item"),
        to_date(col("o_orderdate")).as("fact_date"))
      val details = Seq(
        ("RCON2170", "1992-01-01", "1996-01-01", "FFIEC 031", "RCON", "total assets (v1)"),
        ("RCON2170", "1996-01-01", null, "FFIEC 041", "RCON", "total assets (v2)"),
        ("RCON2171", "1994-06-30", "1997-06-30", "FFIEC 031", "RCON", "cash (v1)"),
        ("RCON2171", "1997-06-30", null, "FFIEC 041", "RCON", "cash (v2)"),
        ("RCON2172", "1995-03-31", null, "FFIEC 041", "RCON", "securities"))
        .toDF("item", "s", "e", "reporting_form", "itemtype", "description")
        .select(col("item"), to_date(col("s")).as("start_date"),
          to_date(col("e")).as("end_date"), col("reporting_form"),
          col("itemtype"), col("description"))
      meta.Items.definitionsAt(facts, "item", "fact_date", details)
        // both sides carry `item` (facts key + dimension key); keep the
        // fact side — it is non-null on the unmatched left-join path
        .select(col("o_orderkey"), facts("item").as("item"), col("fact_date"),
          col("reporting_form"), col("itemtype"), col("description"))
        .orderBy("o_orderkey")
    }),

// SCD2 history builder: collapse the per-(customer, date) order
    // status series into effective-dated versions — the operator that
    // BUILDS tables like q56's item_details dimension from raw
    // periodic observations. Snapshot attr is MAX(status) per day
    // (deterministic); the oracle replays lag-change/running-version/
    // lead-close with the same null-safe change test.
    "q80_scd2_history" -> ((s, dir) => {
      val snap = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderstatus")).as("status"))
      operators.AsOfJoin.scd2(snap, Seq("o_custkey"), "o_orderdate", Seq("status"))
        .orderBy("o_custkey", "valid_from")
    }),

// Z-order (Morton) clustering key: the multi-dimensional layout
    // column zorderWrite ranges/sorts on so parquet min/max stats
    // prune scans filtering on ANY of the interleaved columns. Pure
    // bit arithmetic, exact in any engine.
    "q81_zorder_key" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"),
        operators.Layout.zValue(
          Seq(col("o_custkey"), col("o_orderkey")), bits = 16).as("z"))
        .orderBy("o_orderkey")
    }))

  val oracles: Map[String, String] = Map(

// q21's replay with queries = the whole corpus, nprobe 2, k 3 —
    // the graph edges every vector contributes to its probed cells.
    "q65_knn_graph" ->
      s"""WITH $knnGraphCtes
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

// Shingle count with multiplicity (kernel semantics: < n tokens →
    // one whole-text shingle); self-cosine is 1 for any nonzero vec.
    "q73_sql_surface" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex($normText, ' '), x -> x <> '') AS tk
         |  FROM documents)
         |SELECT t.doc_id,
         |  CAST(CASE WHEN len(t.tk) < 3 THEN 1 ELSE len(t.tk) - 2 END AS INTEGER) AS n_shingles,
         |  ROUND(${cosSql("e.embedding", "e.embedding")}, 6) AS self_sim
         |FROM tk t JOIN embeddings e ON t.doc_id = e.vec_id
         |ORDER BY t.doc_id""".stripMargin,

// q21's probe machinery + data-sampled codebooks (the SAME bottom-16
    // md5 rows as the centroids) + q51's encode/ADC/shortlist/re-rank,
    // scoped to the probed cells.
    "q75_ivfpq_persisted" ->
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
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |cwrows AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(embedding AS DOUBLE[]) AS v
         |  FROM (SELECT h, embedding FROM hashed ORDER BY h LIMIT 16) y),
         |books AS (
         |  SELECT ss.s, cwrows.code AS c, cwrows.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cwrows CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |dist AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN books b),
         |enc AS (
         |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY vec_id),
         |qd AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT query_id, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY query_id, s) x
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 9), s ->
         |      qt.tabs[s][en.codes[s] + 1]), (a, b) -> a + b) AS adc
         |  FROM cells cl
         |  JOIN qa ON cl.cell = qa.cell
         |  JOIN enc en ON en.vec_id = cl.id
         |  JOIN qtab qt ON qt.query_id = qa.query_id
         |  WHERE cl.id <> qa.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// q75's probe scaffolding with DATA-DERIVED two-level books: b1 =
    // subvectors of the bottom-32 md5 rows' first 16, b2 = residuals
    // of the holdout 16 vs their level-1 argmin codeword; then q53's
    // interleaved encode/ADC replay scoped to the probed cells.
    "q76_ivfrq_persisted" ->
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
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |cw32 AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(embedding AS DOUBLE[]) AS v
         |  FROM (SELECT h, embedding FROM hashed ORDER BY h LIMIT 32) y),
         |b1 AS (
         |  SELECT ss.s, cw32.code AS c, cw32.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cw32 CROSS JOIN (SELECT unnest(range(8)) AS s) ss
         |  WHERE cw32.code < 16),
         |hsub AS (
         |  SELECT ss.s, cw32.code - 16 AS j2, cw32.v[ss.s*8+1 : ss.s*8+8] AS sub
         |  FROM cw32 CROSS JOIN (SELECT unnest(range(8)) AS s) ss
         |  WHERE cw32.code >= 16),
         |hd2 AS (
         |  SELECT h.s, h.j2, b.c, h.sub, b.cw,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (h.sub[j] - b.cw[j]) * (h.sub[j] - b.cw[j])), (a, x) -> a + x) AS d
         |  FROM hsub h JOIN b1 b ON b.s = h.s),
         |b2 AS (
         |  SELECT s, j2 AS c,
         |    list_transform(range(1, 9), j -> sub[j] - cw[j]) AS cw FROM (
         |    SELECT s, j2, sub, cw,
         |      row_number() OVER (PARTITION BY s, j2 ORDER BY d ASC, c ASC) AS rn
         |    FROM hd2) x WHERE rn = 1),
         |dist1 AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN b1 b),
         |c1 AS (
         |  SELECT vec_id, s, c AS c1 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist1) x WHERE rn = 1),
         |dist2 AS (
         |  SELECT c1.vec_id, c1.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])
         |        * ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM c1
         |  JOIN embeddings e ON e.vec_id = c1.vec_id
         |  JOIN b1 w1 ON w1.s = c1.s AND w1.c = c1.c1
         |  JOIN b2 b ON b.s = c1.s),
         |c2 AS (
         |  SELECT vec_id, s, c AS c2 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist2) x WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, list(code ORDER BY pos) AS codes FROM (
         |    SELECT vec_id, s * 2 AS pos, c1 AS code FROM c1
         |    UNION ALL
         |    SELECT vec_id, s * 2 + 1 AS pos, c2 AS code FROM c2) u
         |  GROUP BY vec_id),
         |qd1 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b1 b WHERE q.vec_id % 100 = 0),
         |qd2 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b2 b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY pos) AS tabs FROM (
         |    SELECT query_id, s * 2 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd1 GROUP BY query_id, s
         |    UNION ALL
         |    SELECT query_id, s * 2 + 1 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd2 GROUP BY query_id, s) u
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 17), i ->
         |      qt.tabs[i][en.codes[i] + 1]), (a, b) -> a + b) AS adc
         |  FROM cells cl
         |  JOIN qa ON cl.cell = qa.cell
         |  JOIN enc en ON en.vec_id = cl.id
         |  JOIN qtab qt ON qt.query_id = qa.query_id
         |  WHERE cl.id <> qa.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

"q21_knn_ivf" -> ivfOracleSql,

// Persisted-index twin: identical semantics, answered through the
    // on-disk cell-partitioned index + pruned probe.
    "q72_ivf_persisted" -> ivfOracleSql,

// The assignment chain + per-cell counts with the tombstone class
    // tallied (not removed — stats see the backlog, probes do not).
    "q358_ivf_store_stats" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, cell FROM assign WHERE rn = 1)
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_tombstoned
         |FROM cells GROUP BY cell ORDER BY cell""".stripMargin,

// q72's probe chain over the post-delete survivors (id % 7 <> 3
    // drops BEFORE ranking — the pre-top-k contract), emitted once per
    // lifecycle phase; tombstoned and compacted answers must be
    // identical, so both phases read the same MATERIALIZED result.
    "q350_ivf_delete_compact" ->
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
         |cells AS (SELECT id, vec, cell FROM assign
         |          WHERE rn = 1 AND id % 7 <> 3),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |res AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, sim, rank FROM (
         |    SELECT query_id, neighbor_id, sim,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM scored) r WHERE rank <= 5)
         |SELECT 'tombstoned' AS phase, * FROM res
         |UNION ALL
         |SELECT 'compacted' AS phase, * FROM res
         |ORDER BY phase, query_id, rank""".stripMargin,

// q76's chain with the training CTEs (centroids + both codebook
    // levels) scoped to the 80% build slice and encode/assignment over
    // the full corpus — exactly what build-then-append produces.
    "q352_ivfrq_append" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |tr AS (SELECT h, embedding FROM hashed WHERE vec_id % 5 <> 4),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM tr ORDER BY h LIMIT 16),
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
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |cw32 AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(embedding AS DOUBLE[]) AS v
         |  FROM (SELECT h, embedding FROM tr ORDER BY h LIMIT 32) y),
         |b1 AS (
         |  SELECT ss.s, cw32.code AS c, cw32.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cw32 CROSS JOIN (SELECT unnest(range(8)) AS s) ss
         |  WHERE cw32.code < 16),
         |hsub AS (
         |  SELECT ss.s, cw32.code - 16 AS j2, cw32.v[ss.s*8+1 : ss.s*8+8] AS sub
         |  FROM cw32 CROSS JOIN (SELECT unnest(range(8)) AS s) ss
         |  WHERE cw32.code >= 16),
         |hd2 AS (
         |  SELECT h.s, h.j2, b.c, h.sub, b.cw,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (h.sub[j] - b.cw[j]) * (h.sub[j] - b.cw[j])), (a, x) -> a + x) AS d
         |  FROM hsub h JOIN b1 b ON b.s = h.s),
         |b2 AS (
         |  SELECT s, j2 AS c,
         |    list_transform(range(1, 9), j -> sub[j] - cw[j]) AS cw FROM (
         |    SELECT s, j2, sub, cw,
         |      row_number() OVER (PARTITION BY s, j2 ORDER BY d ASC, c ASC) AS rn
         |    FROM hd2) x WHERE rn = 1),
         |dist1 AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN b1 b),
         |c1 AS (
         |  SELECT vec_id, s, c AS c1 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist1) x WHERE rn = 1),
         |dist2 AS (
         |  SELECT c1.vec_id, c1.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])
         |        * ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM c1
         |  JOIN embeddings e ON e.vec_id = c1.vec_id
         |  JOIN b1 w1 ON w1.s = c1.s AND w1.c = c1.c1
         |  JOIN b2 b ON b.s = c1.s),
         |c2 AS (
         |  SELECT vec_id, s, c AS c2 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist2) x WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, list(code ORDER BY pos) AS codes FROM (
         |    SELECT vec_id, s * 2 AS pos, c1 AS code FROM c1
         |    UNION ALL
         |    SELECT vec_id, s * 2 + 1 AS pos, c2 AS code FROM c2) u
         |  GROUP BY vec_id),
         |qd1 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b1 b WHERE q.vec_id % 100 = 0),
         |qd2 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b2 b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY pos) AS tabs FROM (
         |    SELECT query_id, s * 2 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd1 GROUP BY query_id, s
         |    UNION ALL
         |    SELECT query_id, s * 2 + 1 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd2 GROUP BY query_id, s) u
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 17), i ->
         |      qt.tabs[i][en.codes[i] + 1]), (a, b) -> a + b) AS adc
         |  FROM cells cl
         |  JOIN qa ON cl.cell = qa.cell
         |  JOIN enc en ON en.vec_id = cl.id
         |  JOIN qtab qt ON qt.query_id = qa.query_id
         |  WHERE cl.id <> qa.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// q72's probe chain with the label attribute carried through the
    // assignment and the pre-rank predicate (the Spark side filters
    // the pruned cell scan before scoring — same algebra).
    "q345_ivf_filtered" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding, label,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |assign AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, hd.label, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, label, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id AND cl.label % 3 = 1),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// q72's probe chain with the threshold replacing the rank cap.
    "q346_ivf_range" ->
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
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
         |scored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id)
         |SELECT query_id, neighbor_id, sim FROM scored WHERE sim >= 0.25
         |ORDER BY query_id, neighbor_id""".stripMargin,

"q20_knn_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
         |           FROM embeddings WHERE vec_id % 100 = 0),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         ROUND(${cosSql("e.embedding", "q.qvec")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |                            ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

"q46_knn_ivf_refined" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |cents0 AS (
         |  SELECT h AS cell, CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM hashed ORDER BY h LIMIT 16),
         |asn0 AS (
         |  SELECT hd.vec_id AS id, hd.embedding AS vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.vec_id
         |      ORDER BY list_cosine_similarity(CAST(hd.embedding AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents0 c),
         |members AS (SELECT id, vec, cell FROM asn0 WHERE rn = 1),
         |cm AS (
         |  SELECT cell, d,
         |    list_reduce(list(CAST(vec[d] AS DOUBLE) ORDER BY id), (a, b) -> a + b)
         |      / COUNT(*) AS mu
         |  FROM members CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
         |  GROUP BY cell, d),
         |cents AS (SELECT cell, list(mu ORDER BY d) AS cvec FROM cm GROUP BY cell),
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
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id % 100 = 0) x
         |  WHERE rk <= 4),
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
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// PQ ADC replay: same 8×16×8 seeded codebooks as VALUES literals;
    // every float step (argmin-L2 encode, per-query dot tables, ADC
    // fold, cosine re-rank) is an ordered left fold in both engines.
    "q51_pq_adc" ->
      s"""WITH books(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 13L)}),
         |dist AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN books b),
         |enc AS (
         |  SELECT vec_id, list(c ORDER BY s) AS codes FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY vec_id),
         |qd AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT query_id, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY query_id, s) x
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qt.query_id, e.vec_id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 9), s ->
         |      qt.tabs[s][e.codes[s] + 1]), (a, b) -> a + b) AS adc
         |  FROM enc e CROSS JOIN qtab qt
         |  WHERE e.vec_id <> qt.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// Residual-quantization replay: two seeded codebook levels as VALUES
    // literals; level-1 argmin encode, then argmin over the level-2 books
    // for the RESIDUAL sub − cw1; interleaved codes [c1_0,c2_0,...] scored
    // against interleaved dot tables — every float step an ordered fold.
    "q53_rq_adc" ->
      s"""WITH b1(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 13L)}),
         |b2(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 29L)}),
         |dist1 AS (
         |  SELECT e.vec_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN b1 b),
         |c1 AS (
         |  SELECT vec_id, s, c AS c1 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist1) x WHERE rn = 1),
         |dist2 AS (
         |  SELECT c1.vec_id, c1.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])
         |        * ((CAST(e.embedding[c1.s * 8 + j] AS DOUBLE) - w1.cw[j]) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM c1
         |  JOIN embeddings e ON e.vec_id = c1.vec_id
         |  JOIN b1 w1 ON w1.s = c1.s AND w1.c = c1.c1
         |  JOIN b2 b ON b.s = c1.s),
         |c2 AS (
         |  SELECT vec_id, s, c AS c2 FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist2) x WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, list(code ORDER BY pos) AS codes FROM (
         |    SELECT vec_id, s * 2 AS pos, c1 AS code FROM c1
         |    UNION ALL
         |    SELECT vec_id, s * 2 + 1 AS pos, c2 AS code FROM c2) u
         |  GROUP BY vec_id),
         |qd1 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b1 b WHERE q.vec_id % 100 = 0),
         |qd2 AS (
         |  SELECT q.vec_id AS query_id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN b2 b WHERE q.vec_id % 100 = 0),
         |qtab AS (
         |  SELECT query_id, list(dots ORDER BY pos) AS tabs FROM (
         |    SELECT query_id, s * 2 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd1 GROUP BY query_id, s
         |    UNION ALL
         |    SELECT query_id, s * 2 + 1 AS pos, list(dp ORDER BY c) AS dots
         |    FROM qd2 GROUP BY query_id, s) u
         |  GROUP BY query_id),
         |scored AS (
         |  SELECT qt.query_id, e.vec_id AS neighbor_id,
         |    list_reduce(list_transform(range(1, 17), i ->
         |      qt.tabs[i][e.codes[i] + 1]), (a, b) -> a + b) AS adc
         |  FROM enc e CROSS JOIN qtab qt
         |  WHERE e.vec_id <> qt.query_id),
         |short AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY adc DESC, neighbor_id ASC) AS rn
         |    FROM scored) x WHERE rn <= 50),
         |exact AS (
         |  SELECT sh.query_id, sh.neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM short sh
         |  JOIN embeddings e ON e.vec_id = sh.neighbor_id
         |  JOIN embeddings q ON q.vec_id = sh.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM exact)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// One ordered-fold Lloyd round over the md5-bottom-16 sampled
    // codebooks (the q46 trick applied to PQ): sample → slice → argmin
    // encode → per-(s,code,d) ordered mean; no-member codewords keep
    // their sampled value.
    "q55_pq_kmeans_ordered" ->
      s"""WITH hashed AS (
         |  SELECT vec_id, embedding,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |samp AS (
         |  SELECT embedding, row_number() OVER (ORDER BY h) - 1 AS code
         |  FROM (SELECT * FROM hashed ORDER BY h LIMIT 16) x),
         |books0 AS (
         |  SELECT ss.s, samp.code,
         |    list_transform(range(1, 9), j ->
         |      CAST(samp.embedding[ss.s * 8 + j] AS DOUBLE)) AS cw
         |  FROM samp CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |dist AS (
         |  SELECT e.vec_id, b.s, b.code AS c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.embedding[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM embeddings e CROSS JOIN books0 b),
         |enc AS (
         |  SELECT vec_id, s, c FROM (
         |    SELECT vec_id, s, c,
         |      row_number() OVER (PARTITION BY vec_id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x WHERE rn = 1),
         |members AS (
         |  SELECT en.s, en.c AS code, dd.d, hd.vec_id,
         |    CAST(hd.embedding[en.s * 8 + dd.d] AS DOUBLE) AS x
         |  FROM enc en JOIN hashed hd ON hd.vec_id = en.vec_id
         |  CROSS JOIN (SELECT unnest(range(1, 9)) AS d) dd),
         |mu AS (
         |  SELECT s, code, d,
         |    list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b)
         |      / COUNT(*) AS mu
         |  FROM members GROUP BY s, code, d)
         |SELECT CAST(b.s AS INT) AS s, CAST(b.code AS INT) AS code,
         |  CAST(dd.d AS INT) AS d,
         |  ROUND(COALESCE(mu.mu, b.cw[dd.d]), 6) AS mu
         |FROM books0 b
         |CROSS JOIN (SELECT unnest(range(1, 9)) AS d) dd
         |LEFT JOIN mu ON mu.s = b.s AND mu.code = b.code AND mu.d = dd.d
         |ORDER BY s, code, d""".stripMargin,

"q52_range_join" ->
      """WITH epochs AS (
        |  SELECT c_custkey, v.s AS start_date, v.e AS end_date, v.epoch
        |  FROM customer CROSS JOIN (VALUES
        |    (DATE '1995-01-01', DATE '1998-01-01', 'early'),
        |    (DATE '1998-01-01', NULL, 'late')) v(s, e, epoch)
        |  WHERE c_custkey % 3 <> 0)
        |SELECT o.o_orderkey, o.o_custkey,
        |       CAST(o.o_orderdate AS DATE) AS o_date, e.epoch
        |FROM orders o LEFT JOIN epochs e
        |  ON o.o_custkey = e.c_custkey
        | AND e.start_date <= CAST(o.o_orderdate AS DATE)
        | AND (e.end_date IS NULL OR CAST(o.o_orderdate AS DATE) < e.end_date)
        |ORDER BY o_orderkey""".stripMargin,

"q56_item_definitions" ->
      """WITH details(item, start_date, end_date, reporting_form, itemtype, description) AS (VALUES
        |  ('RCON2170', DATE '1992-01-01', DATE '1996-01-01', 'FFIEC 031', 'RCON', 'total assets (v1)'),
        |  ('RCON2170', DATE '1996-01-01', NULL, 'FFIEC 041', 'RCON', 'total assets (v2)'),
        |  ('RCON2171', DATE '1994-06-30', DATE '1997-06-30', 'FFIEC 031', 'RCON', 'cash (v1)'),
        |  ('RCON2171', DATE '1997-06-30', NULL, 'FFIEC 041', 'RCON', 'cash (v2)'),
        |  ('RCON2172', DATE '1995-03-31', NULL, 'FFIEC 041', 'RCON', 'securities')),
        |facts AS (
        |  SELECT o_orderkey,
        |    'RCON' || CAST(o_orderkey % 4 + 2170 AS VARCHAR) AS item,
        |    CAST(o_orderdate AS DATE) AS fact_date
        |  FROM orders)
        |SELECT f.o_orderkey, f.item, f.fact_date,
        |  d.reporting_form, d.itemtype, d.description
        |FROM facts f LEFT JOIN details d
        |  ON f.item = d.item
        | AND d.start_date <= f.fact_date
        | AND (d.end_date IS NULL OR f.fact_date < d.end_date)
        |ORDER BY o_orderkey""".stripMargin,

// The same bit interleave, generated term-for-term: bit b of
    // column i lands at output bit b*2+i.
    "q81_zorder_key" -> {
      val z = (for (b <- 0 until 16; (c, i) <- Seq("o_custkey", "o_orderkey").zipWithIndex)
        yield s"(((CAST($c AS BIGINT) >> $b) & 1) << ${b * 2 + i})")
        .mkString(" | ")
      s"""SELECT o_orderkey, $z AS z
         |FROM orders ORDER BY o_orderkey""".stripMargin
    },

// lag-change flag (IS DISTINCT FROM = the null-safe <=> test),
    // running SUM = version, MIN(date) per version, lead() closes.
    "q80_scd2_history" ->
      """WITH snap AS (
        |  SELECT o_custkey, o_orderdate, MAX(o_orderstatus) AS status
        |  FROM orders GROUP BY 1, 2),
        |f AS (
        |  SELECT o_custkey, o_orderdate, status,
        |    CASE WHEN status IS DISTINCT FROM lag(status) OVER w
        |      THEN 1 ELSE 0 END AS chg
        |  FROM snap WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)),
        |v AS (
        |  SELECT o_custkey, o_orderdate, status,
        |    CAST(SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ver
        |  FROM f),
        |g AS (
        |  SELECT o_custkey, status, ver, MIN(o_orderdate) AS valid_from
        |  FROM v GROUP BY 1, 2, 3)
        |SELECT o_custkey, status, valid_from,
        |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from)
        |    AS valid_to
        |FROM g ORDER BY o_custkey, valid_from""".stripMargin)
}
