package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Knn, Pq}

import graft.entry.EntryHelpers._

/** Gate registry, graph-ANN index family (round 11) — the layered
  * HNSW store, the auto-sized graph build, and the streaming ingest
  * twin. Split into its own family file at birth (SURVEY §7 registry
  * growth watch: GatesDedup/GatesSimilarity were already near the 3k
  * sub-split threshold).
  */
private[graft] object GatesGraphAnn {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multi-layer HNSW lifecycle (round 11, r10 verdict ask #1): the
    // persisted graph store built with TWO express layers (geometric
    // md5 levels, P(level>=l) = 4^-l), then a descent search — beam
    // walk seeded at layer 2's per-cell entries, each lower layer
    // re-walked seeded by the beam above. The oracle replays the
    // level CASE, all three per-layer kNN graphs, the entry table,
    // and every walk round as one CTE chain.
    // Gate corpus = the EVEN half (round-12 bench hygiene, r11
    // verdict ask #8): halves the per-layer kNN builds and the
    // oracle's CTE chains without touching the query set (every
    // vec_id % 100 == 0 id is even). Same trim on q333/q334/q338.
    "q329_graph_hnsw" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_hnsw_gate").toString
      Knn.writeGraphIndex(half, "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true, layers = 2)
      Knn.searchGraphIndex(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // The AUTO-SIZED graph build under the gate (round 11, r10
    // verdict ask #4): targetCellSize drives cEff = max(c, ceil(n /
    // target)) — the configuration the §5c scale sweep showed restores
    // linear build cost, previously shipped without an oracle. The
    // oracle derives the same cEff from a count CTE and bounds the
    // centroid pick with it, then replays the identical cell join.
    "q330_graph_autosized" -> ((s, dir) => {
      Knn.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, c = 4, nprobe = 2, portableHash = true,
        targetCellSize = 50)
        .orderBy("query_id", "rank")
    }),

    // Graph-store DELETE → COMPACT lifecycle (round 11 — the last
    // persisted index family to gain the delete/compact pair every
    // other store carries): build over the full corpus, tombstone the
    // %10==3 decile, compact (nodes/edges drop deleted endpoints,
    // entries recompute as the min SURVIVING id per cell against the
    // ORIGINAL centroids), then search. The oracle filters the
    // replayed full-corpus graph the same way — edges lose either
    // deleted endpoint, entry cells re-min over survivors.
    "q337_graph_delete_compact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gdel_gate").toString
      Knn.writeGraphIndex(emb, "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true)
      Knn.deleteFromGraphIndex(
        emb.where(col("vec_id") % 10 === 3).select("vec_id"),
        "vec_id", tmp)
      Knn.compactGraphStore(s, tmp)
      Knn.searchGraphIndex(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // LAYERED NSW append under the oracle (round 11, closing the
    // "layered insert is spec-only" gap the same round it opened):
    // a layers=1 store built over 90%, the held-out 10% NSW-inserted
    // at EVERY layer its hash level reaches (layer-0 insert for the
    // whole batch, layer-1 insert for the level>=1 members — both
    // walks against the PRE-append graph, per appendGraphIndex's
    // read-then-write phases), then a descent search over the
    // appended store. The oracle runs graphInsertCtes once per layer
    // and descends through the post-insert edge/entry tables.
    "q334_graph_hnsw_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_hnswapp_gate").toString
      Knn.writeGraphIndex(half.where(col("vec_id") % 10 =!= 6),
        "vec_id", "embedding", tmp, k = 3, c = 16, nprobe = 2,
        buckets = 8, portableHash = true, layers = 1)
      Knn.appendGraphIndex(half.where(col("vec_id") % 10 === 6),
        "vec_id", "embedding", tmp, beam = 4, hops = 2)
      Knn.searchGraphIndex(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // α-RNG NEIGHBOR-DIVERSIFIED graph store under the gate (round 12,
    // r11 verdict ask #1): build over 90% with diversified edge
    // selection (k=3 edges α-selected from a kCand=6 candidate pool),
    // NSW-append the held-out decile (diversified out-edges AND
    // diversified per-source re-trim), then search. The oracle replays
    // the candidate ranking, the pairwise α-prune, the rank-order
    // backfill, the diversified insert, and every walk round as one
    // CTE chain — the select-neighbors heuristic itself is under the
    // cross-engine value gate, at both build and append.
    "q338_graph_diverse" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gdiv_gate").toString
      Knn.writeGraphIndex(half.where(col("vec_id") % 10 =!= 6),
        "vec_id", "embedding", tmp, k = 3, c = 16, nprobe = 2,
        buckets = 8, portableHash = true, alpha = 1.0, kCand = 6)
      Knn.appendGraphIndex(half.where(col("vec_id") % 10 === 6),
        "vec_id", "embedding", tmp, beam = 4, hops = 2)
      Knn.searchGraphIndex(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // CODED graph walk under the gate (round 12 — the DiskANN layout:
    // walk on PQ codes, exact re-rank at the end): flat store over
    // the even half + the writeGraphCodes sidecar (DATA-TRAINED
    // codebooks since round 13 — the q75 bottom-16-md5 sampling over
    // the store's own corpus, replayed by the oracle's cwr/books
    // CTEs, r12 verdict ask #4),
    // then searchGraphIndexAdc: ADC-scored seeds and hops over the
    // codes scan, full vectors read only for the final beam's exact
    // 6-dp cosine re-rank. The oracle replays the argmin-L2 encode,
    // the per-query dot tables, every ADC-ranked walk round, and the
    // re-rank as one CTE chain.
    // LAYERED coded walk (round 12, closing the flat-only scope the
    // same round it opened): a layers=1 store + codes sidecar, the
    // ADC descent — top-layer walk seeded from its entries, layer 0
    // re-walked seeded by the beam above, every score an ADC lookup —
    // then the exact re-rank. Oracle: per-layer graph builds, the
    // argmin encode, ADC beam + descent CTEs, re-rank.
    "q343_graph_adc_layered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      // data-trained books, the q75 bottom-16 md5 convention (round 13
      // — see q340)
      val books = Pq.trainCodebooks(half, "vec_id", "embedding",
        m = 8, k = 16, dim = 64)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gadcl_gate").toString
      Knn.writeGraphIndex(half, "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true, layers = 1)
      Knn.writeGraphCodes(s, tmp, books)
      Knn.searchGraphIndexAdc(s, tmp, books,
        emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // WIDE-BEAM ADC operating point (round 14, r13 verdict ask #4 —
    // the DiskANN recipe, now GATED cross-engine instead of only
    // recall-measured): the coded walk with beam ≫ k (16 vs 3; q340
    // gates beam=4) — wide coded exploration, exact re-rank on the
    // final beam. RECALL_r13 measured this operating point at 0.54 @
    // beam 96 ≈ the exact walk's 0.55; this gate pins the beam-wide
    // walk's VALUE semantics (every ADC-ranked hop at width 16, the
    // re-rank boundary) against the oracle's unrolled replay.
    "q353_graph_adc_widebeam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val books = Pq.trainCodebooks(half, "vec_id", "embedding",
        m = 8, k = 16, dim = 64)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gadcw_gate").toString
      Knn.writeGraphIndex(half, "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true)
      Knn.writeGraphCodes(s, tmp, books)
      Knn.searchGraphIndexAdc(s, tmp, books,
        emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        beam = 16, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    "q340_graph_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      // DATA-TRAINED books (round 13, r12 verdict ask #4): the q75
      // bottom-16-by-md5 sampling convention over the store's own
      // corpus — the coded walk now gates on the codebook distribution
      // it would really run with, not the seeded-gaussian stand-in.
      val books = Pq.trainCodebooks(half, "vec_id", "embedding",
        m = 8, k = 16, dim = 64)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gadc_gate").toString
      Knn.writeGraphIndex(half, "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true)
      Knn.writeGraphCodes(s, tmp, books)
      Knn.searchGraphIndexAdc(s, tmp, books,
        emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // CODES-SIDECAR APPEND lifecycle (round 13, r12 verdict ask #1 —
    // the one silent-wrong-results hazard left in the repo): build a
    // coded store over 90% of the even half, writeGraphCodes, then
    // NSW-append the held-out decile. appendGraphIndex must encode the
    // batch's codes THROUGH the persisted codes_books in the same
    // append, so the ADC walk sees the appended vectors with no manual
    // re-encode (pre-r13 they were silently invisible). The oracle
    // replays the insert, re-derives the codes over the POST-insert
    // vector table, and walks — value-exact only if the appended rows
    // really are ADC-visible.
    "q344_graph_codes_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val books = pqBooks(m = 8, k = 16, subDim = 8, seed = 13L)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gcapp_gate").toString
      Knn.writeGraphIndex(half.where(col("vec_id") % 10 =!= 6),
        "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true)
      Knn.writeGraphCodes(s, tmp, books)
      Knn.appendGraphIndex(half.where(col("vec_id") % 10 === 6),
        "vec_id", "embedding", tmp, beam = 4, hops = 2)
      Knn.searchGraphIndexAdc(s, tmp, books,
        emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }),

    // FILTERED graph search (round 13 — the graph twin of q345): the
    // store built with keep=Seq("label") carries the attribute in
    // path/nodes; the walk navigates UNFILTERED (filtering navigation
    // would disconnect the graph) and the predicate evaluates on the
    // final beam pre-top-k, beam >> k to leave post-filter slack. The
    // oracle replays the walk and applies the same pre-rank WHERE.
    "q347_graph_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_gfil_gate").toString
      Knn.writeGraphIndex(half, "vec_id", "embedding", tmp, k = 3, c = 16,
        nprobe = 2, buckets = 8, portableHash = true,
        keep = Seq("label"))
      Knn.searchGraphIndexFiltered(s, tmp,
        emb.where(col("vec_id") % 100 === 0), "vec_id", "embedding",
        beam = 8, hops = 2, k = 3, pred = col("label") % 3 === 1)
        .orderBy("query_id", "rank")
    }),

    // Streaming NSW ingest under the gate (round 11, r10 verdict ask
    // #8): the store built over 60% of the corpus, then TWO
    // micro-batches land through ingestGraphStream's foreachBatch
    // append (batch 2 beam-searches the post-batch-1 graph), then a
    // multi-seed search over the final store. The oracle chains two
    // graphInsertCtes rounds — each round's edges/entries/vectors feed
    // the next — so the micro-batch sequencing itself is replayed.
    "q333_graph_ingest_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val emb = t(s, dir, "embeddings")
      val half = emb.where(col("vec_id") % 2 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ingest_gate").toString
      Knn.writeGraphIndex(half.where(col("vec_id") % 10 < 6),
        "vec_id", "embedding", tmp, k = 3, c = 16, nprobe = 2,
        buckets = 8, portableHash = true)
      def rows(m: Seq[Int]): Seq[(Long, Seq[Float])] =
        half.where(pmod(col("vec_id"), lit(10)).isin(m: _*))
          .select(col("vec_id").cast("long"), col("embedding"))
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])]
      val q = Knn.ingestGraphStream(input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", tmp,
        java.nio.file.Files.createTempDirectory("graft_ingest_ck").toString,
        beam = 4, hops = 2)
      try {
        input.addData(rows(Seq(6, 7)))
        q.processAllAvailable()
        input.addData(rows(Seq(8, 9)))
        q.processAllAvailable()
      } finally q.stop()
      Knn.searchGraphIndex(s, tmp, emb.where(col("vec_id") % 100 === 0),
        "vec_id", "embedding", beam = 4, hops = 2, k = 3)
        .orderBy("query_id", "rank")
    }))

  /** Level CASE over the md5 hash — the SQL twin of Knn.levelOf
    * (largest l ≤ 2 with h mod 4^l = 0; h is the non-negative 60-bit
    * md5-derived hash, so % is safe). */
  private val lvlCase =
    "CASE WHEN h % 16 = 0 THEN 2 WHEN h % 4 = 0 THEN 1 ELSE 0 END"

  val oracles: Map[String, String] = Map(

    "q329_graph_hnsw" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |lv AS (SELECT id, vec, h, $lvlCase AS lev FROM hs),
         |sub1 AS (SELECT id, vec, h FROM lv WHERE lev >= 1),
         |sub2 AS (SELECT id, vec, h FROM lv WHERE lev >= 2),
         |${layerKnnGraphCtes("l0", "hs", 16, 2, 3)},
         |${layerKnnGraphCtes("l1", "sub1", 16, 2, 3)},
         |${layerKnnGraphCtes("l2", "sub2", 16, 2, 3)},
         |gcents AS (
         |  SELECT h AS cell, CAST(vec AS DOUBLE[]) AS cvec
         |  FROM hs ORDER BY h LIMIT 16),
         |easg2 AS (
         |  SELECT s.id, c.cell,
         |    row_number() OVER (PARTITION BY s.id
         |      ORDER BY list_cosine_similarity(CAST(s.vec AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM sub2 s CROSS JOIN gcents c),
         |ent2 AS (SELECT cell, MIN(id) AS node FROM easg2
         |         WHERE rn = 1 GROUP BY cell),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |${graphBeamCtes("t2", "sq", "av", "l2e", "ent2", beam = 4, hops = 2)},
         |${graphDescentCtes("t1", "t2b2", "sq", "av", "l1e", beam = 4, hops = 2)},
         |${graphDescentCtes("t0", "t1b2", "sq", "av", "l0e", beam = 4, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM t0b2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // cEff derived in-query: GREATEST(4, ceil(n/50)) via the count
    // CTE (non-negative operands, so // truncation = the Scala ceil
    // trick exactly), bounding a row_number over the md5 order — the
    // closed-form twin of the one count job the Scala side runs.
    "q330_graph_autosized" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |ce AS (SELECT GREATEST(4, (COUNT(*) + 49) // 50) AS c
         |       FROM embeddings),
         |cents AS (
         |  SELECT h AS cell, CAST(vec AS DOUBLE[]) AS cvec FROM (
         |    SELECT *, row_number() OVER (ORDER BY h) AS rn FROM hs) x
         |  CROSS JOIN ce WHERE x.rn <= ce.c),
         |assign AS (
         |  SELECT s.id, s.vec, c.cell,
         |    row_number() OVER (PARTITION BY s.id
         |      ORDER BY list_cosine_similarity(CAST(s.vec AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hs s CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |scored AS (
         |  SELECT qa.id AS query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.vec")}, 6) AS sim
         |  FROM cells cl
         |  JOIN (SELECT id, vec, cell FROM assign WHERE rn <= 2) qa
         |    ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Full-corpus graph replay, then the compaction filters: edges
    // drop either deleted endpoint, entries re-min over survivors
    // (assignment to the ORIGINAL centroids is per-id, so filtering
    // the assigned table = assigning the survivors).
    "q337_graph_delete_compact" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings),
         |${layerKnnGraphCtes("g", "hs", 16, 2, 3)},
         |del AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 10 = 3),
         |ce AS (SELECT src, dst FROM ge
         |       WHERE src NOT IN (SELECT id FROM del)
         |         AND dst NOT IN (SELECT id FROM del)),
         |ent AS (SELECT cell, MIN(id) AS node FROM gcells
         |        WHERE id NOT IN (SELECT id FROM del) GROUP BY cell),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |${graphBeamCtes("z", "sq", "av", "ce", "ent", beam = 4, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM zb2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Layered build over 90% (level CASE at Lmax=1), per-layer
    // inserts of the 10% batch — BOTH against pre-append state (the
    // appendGraphIndex read phase) — then the descent search: top
    // walk over the post-insert layer-1 tables, handed down into the
    // post-insert layer-0 tables. Layer-1 entries assign against the
    // GLOBAL centroid table (l0cents — the store's path/centroids),
    // not the layer's own edge-build sample, mirroring
    // writeGraphIndex's entry maintenance.
    "q334_graph_hnsw_append" ->
      s"""WITH bhs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 <> 6),
         |bsub1 AS (SELECT id, vec, h FROM bhs WHERE h % 4 = 0),
         |${layerKnnGraphCtes("l0", "bhs", 16, 2, 3)},
         |${layerKnnGraphCtes("l1", "bsub1", 16, 2, 3)},
         |ent0 AS (SELECT cell, MIN(id) AS node FROM l0cells GROUP BY cell),
         |gea1 AS (
         |  SELECT s.id, c.cell,
         |    row_number() OVER (PARTITION BY s.id
         |      ORDER BY list_cosine_similarity(CAST(s.vec AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM bsub1 s CROSS JOIN l0cents c),
         |ent1 AS (SELECT cell, MIN(id) AS node FROM gea1
         |         WHERE rn = 1 GROUP BY cell),
         |gv AS (SELECT id AS node, CAST(vec AS DOUBLE[]) AS nvec FROM bhs),
         |bat AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 = 6),
         |bat0 AS (SELECT id, vec FROM bat),
         |bat1 AS (SELECT id, vec FROM bat WHERE h % 4 = 0),
         |${graphInsertCtes("i0", "bat0", "gv", "l0e", "ent0", "l0cents",
                            beam = 4, hops = 2, k = 3)},
         |${graphInsertCtes("i1", "bat1", "gv", "l1e", "ent1", "l0cents",
                            beam = 4, hops = 2, k = 3)},
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |${graphBeamCtes("t1", "sq", "av", "i1e", "i1ent", beam = 4, hops = 2)},
         |${graphDescentCtes("t0", "t1b2", "sq", "av", "i0e", beam = 4, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM t0b2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Layered build (level CASE at Lmax=1), per-layer edge graphs,
    // the argmin encode, ADC beam walk at layer 1 handed down into
    // layer 0, exact re-rank.
    "q343_graph_adc_layered" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |cwr AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(vec AS DOUBLE[]) AS v
         |  FROM (SELECT h, vec FROM hs ORDER BY h LIMIT 16) y),
         |books AS (
         |  SELECT ss.s, cwr.code AS c, cwr.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cwr CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |sub1 AS (SELECT id, vec, h FROM hs WHERE h % 4 = 0),
         |${layerKnnGraphCtes("l0", "hs", 16, 2, 3)},
         |${layerKnnGraphCtes("l1", "sub1", 16, 2, 3)},
         |gea1 AS (
         |  SELECT s.id, c.cell,
         |    row_number() OVER (PARTITION BY s.id
         |      ORDER BY list_cosine_similarity(CAST(s.vec AS DOUBLE[]), c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM sub1 s CROSS JOIN l0cents c),
         |ent1 AS (SELECT cell, MIN(id) AS node FROM gea1
         |         WHERE rn = 1 GROUP BY cell),
         |dist AS (
         |  SELECT e.id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.vec[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.vec[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM hs e CROSS JOIN books b),
         |enc AS MATERIALIZED (
         |  SELECT id AS node, list(c ORDER BY s) AS codes FROM (
         |    SELECT id, s, c,
         |      row_number() OVER (PARTITION BY id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY id),
         |qd AS (
         |  SELECT q.vec_id AS qid, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS MATERIALIZED (
         |  SELECT qid, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT qid, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY qid, s) x
         |  GROUP BY qid),
         |${graphBeamAdcCtes("t1", "qtab", "enc", "l1e", "ent1",
                             beam = 4, hops = 2, m = 8)},
         |${graphDescentAdcCtes("t0", "t1b2", "qtab", "enc", "l0e",
                                beam = 4, hops = 2, m = 8)},
         |fin AS (
         |  SELECT t0b2.qid AS query_id, t0b2.node AS neighbor_id,
         |    ROUND(${cosSql("nv.vec", "qv.embedding")}, 6) AS sim
         |  FROM t0b2
         |  JOIN hs nv ON nv.id = t0b2.node
         |  JOIN embeddings qv ON qv.vec_id = t0b2.qid
         |  WHERE t0b2.node <> t0b2.qid),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM fin)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // q340's replay at beam width 16: the same encode/table folds,
    // the ADC beam rounds carrying 16 states per query, exact re-rank.
    "q353_graph_adc_widebeam" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |cwr AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(vec AS DOUBLE[]) AS v
         |  FROM (SELECT h, vec FROM hs ORDER BY h LIMIT 16) y),
         |books AS (
         |  SELECT ss.s, cwr.code AS c, cwr.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cwr CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |${layerKnnGraphCtes("g", "hs", 16, 2, 3)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |dist AS (
         |  SELECT e.id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.vec[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.vec[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM hs e CROSS JOIN books b),
         |enc AS MATERIALIZED (
         |  SELECT id AS node, list(c ORDER BY s) AS codes FROM (
         |    SELECT id, s, c,
         |      row_number() OVER (PARTITION BY id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY id),
         |qd AS (
         |  SELECT q.vec_id AS qid, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS MATERIALIZED (
         |  SELECT qid, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT qid, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY qid, s) x
         |  GROUP BY qid),
         |${graphBeamAdcCtes("z", "qtab", "enc", "ge", "gent",
                             beam = 16, hops = 2, m = 8)},
         |fin AS (
         |  SELECT zb2.qid AS query_id, zb2.node AS neighbor_id,
         |    ROUND(${cosSql("nv.vec", "qv.embedding")}, 6) AS sim
         |  FROM zb2
         |  JOIN hs nv ON nv.id = zb2.node
         |  JOIN embeddings qv ON qv.vec_id = zb2.qid
         |  WHERE zb2.node <> zb2.qid),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM fin)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Half-corpus graph replay + q51's encode/table folds + the
    // ADC-ranked beam rounds + the exact re-rank.
    "q340_graph_adc" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |cwr AS (
         |  SELECT row_number() OVER (ORDER BY h) - 1 AS code,
         |         CAST(vec AS DOUBLE[]) AS v
         |  FROM (SELECT h, vec FROM hs ORDER BY h LIMIT 16) y),
         |books AS (
         |  SELECT ss.s, cwr.code AS c, cwr.v[ss.s*8+1 : ss.s*8+8] AS cw
         |  FROM cwr CROSS JOIN (SELECT unnest(range(8)) AS s) ss),
         |${layerKnnGraphCtes("g", "hs", 16, 2, 3)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |dist AS (
         |  SELECT e.id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (CAST(e.vec[b.s * 8 + j] AS DOUBLE) - b.cw[j])
         |        * (CAST(e.vec[b.s * 8 + j] AS DOUBLE) - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM hs e CROSS JOIN books b),
         |enc AS MATERIALIZED (
         |  SELECT id AS node, list(c ORDER BY s) AS codes FROM (
         |    SELECT id, s, c,
         |      row_number() OVER (PARTITION BY id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY id),
         |qd AS (
         |  SELECT q.vec_id AS qid, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS MATERIALIZED (
         |  SELECT qid, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT qid, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY qid, s) x
         |  GROUP BY qid),
         |${graphBeamAdcCtes("z", "qtab", "enc", "ge", "gent",
                             beam = 4, hops = 2, m = 8)},
         |fin AS (
         |  SELECT zb2.qid AS query_id, zb2.node AS neighbor_id,
         |    ROUND(${cosSql("nv.vec", "qv.embedding")}, 6) AS sim
         |  FROM zb2
         |  JOIN hs nv ON nv.id = zb2.node
         |  JOIN embeddings qv ON qv.vec_id = zb2.qid
         |  WHERE zb2.node <> zb2.qid),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM fin)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Build over 90% + insert of the decile batch (graphInsertCtes —
    // the pre-append walk, reverse links, dedup + re-trim), then the
    // codes table re-derived over the POST-insert vectors (i1v) — the
    // SQL statement of "the sidecar is a pure projection of
    // path/nodes", which the Scala side now maintains incrementally —
    // and the ADC walk + exact re-rank over the appended store.
    "q344_graph_codes_append" ->
      s"""WITH bhs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 <> 6),
         |books(s, c, cw) AS (VALUES
         |      ${pqBooksSql(m = 8, k = 16, subDim = 8, seed = 13L)}),
         |${layerKnnGraphCtes("g", "bhs", 16, 2, 3)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |gv AS (SELECT id AS node, CAST(vec AS DOUBLE[]) AS nvec FROM bhs),
         |bat AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |        WHERE vec_id % 2 = 0 AND vec_id % 10 = 6),
         |${graphInsertCtes("i1", "bat", "gv", "ge", "gent", "gcents",
                            beam = 4, hops = 2, k = 3)},
         |dist AS (
         |  SELECT v.node AS id, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      (v.nvec[b.s * 8 + j] - b.cw[j])
         |        * (v.nvec[b.s * 8 + j] - b.cw[j])),
         |      (a, x) -> a + x) AS d
         |  FROM i1v v CROSS JOIN books b),
         |enc AS MATERIALIZED (
         |  SELECT id AS node, list(c ORDER BY s) AS codes FROM (
         |    SELECT id, s, c,
         |      row_number() OVER (PARTITION BY id, s
         |                         ORDER BY d ASC, c ASC) AS rn
         |    FROM dist) x
         |  WHERE rn = 1 GROUP BY id),
         |qd AS (
         |  SELECT q.vec_id AS qid, b.s, b.c,
         |    list_reduce(list_transform(range(1, 9), j ->
         |      CAST(q.embedding[b.s * 8 + j] AS DOUBLE) * b.cw[j]),
         |      (a, x) -> a + x) AS dp
         |  FROM embeddings q CROSS JOIN books b WHERE q.vec_id % 100 = 0),
         |qtab AS MATERIALIZED (
         |  SELECT qid, list(dots ORDER BY s) AS tabs FROM (
         |    SELECT qid, s, list(dp ORDER BY c) AS dots
         |    FROM qd GROUP BY qid, s) x
         |  GROUP BY qid),
         |${graphBeamAdcCtes("z", "qtab", "enc", "i1e", "i1ent",
                             beam = 4, hops = 2, m = 8)},
         |fin AS (
         |  SELECT zb2.qid AS query_id, zb2.node AS neighbor_id,
         |    ROUND(${cosSql("nv.nvec", "qv.embedding")}, 6) AS sim
         |  FROM zb2
         |  JOIN i1v nv ON nv.node = zb2.node
         |  JOIN embeddings qv ON qv.vec_id = zb2.qid
         |  WHERE zb2.node <> zb2.qid),
         |ranked AS (
         |  SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id ASC) AS rank
         |  FROM fin)
         |SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Diversified build over 90% (α-RNG selection from the kCand-deep
    // candidate ranking, rank-order backfill), diversified insert of
    // the 10% batch against pre-append state, then the beam search
    // over the post-insert tables.
    "q338_graph_diverse" ->
      s"""WITH bhs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 <> 6),
         |${layerKnnGraphDivCtes("g", "bhs", 16, 2, 6, 3, 1000000L)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |gv AS (SELECT id AS node, CAST(vec AS DOUBLE[]) AS nvec FROM bhs),
         |bat AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |        WHERE vec_id % 2 = 0 AND vec_id % 10 = 6),
         |${graphInsertDivCtes("i1", "bat", "gv", "ge", "gent", "gcents",
                               beam = 4, hops = 2, k = 3, kCand = 6,
                               alphaMicro = 1000000L)},
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |${graphBeamCtes("z", "sq", "av", "i1e", "i1ent", beam = 4, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM zb2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Half-corpus graph replay + the walk at beam=8, then the label
    // predicate applied BEFORE the rank window (the Spark side filters
    // the final beam pre-top-k — same algebra).
    "q347_graph_filtered" ->
      s"""WITH hs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |${layerKnnGraphCtes("g", "hs", 16, 2, 3)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |${graphBeamCtes("z", "sq", "av", "ge", "gent", beam = 8, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM zb2 JOIN embeddings e ON e.vec_id = zb2.node
         |        WHERE zb2.node <> zb2.qid AND e.label % 3 = 1)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin,

    // Build over 60%, two chained insert rounds, search — each
    // graphInsertCtes round is exactly one foreachBatch append.
    "q333_graph_ingest_stream" ->
      s"""WITH bhs AS (
         |  SELECT vec_id AS id, embedding AS vec,
         |    ${md5Hash64Sql("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 < 6),
         |${layerKnnGraphCtes("g", "bhs", 16, 2, 3)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |gv AS (SELECT id AS node, CAST(vec AS DOUBLE[]) AS nvec FROM bhs),
         |b1 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |       WHERE vec_id % 2 = 0 AND vec_id % 10 IN (6, 7)),
         |b2 AS (SELECT vec_id AS id, embedding AS vec FROM embeddings
         |       WHERE vec_id % 2 = 0 AND vec_id % 10 IN (8, 9)),
         |${graphInsertCtes("i1", "b1", "gv", "ge", "gent", "gcents",
                            beam = 4, hops = 2, k = 3)},
         |${graphInsertCtes("i2", "b2", "i1v", "i1e", "i1ent", "gcents",
                            beam = 4, hops = 2, k = 3)},
         |sq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |       FROM embeddings WHERE vec_id % 100 = 0),
         |av AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nvec
         |       FROM embeddings),
         |${graphBeamCtes("z", "sq", "av", "i2e", "i2ent", beam = 4, hops = 2)},
         |fin AS (SELECT qid AS query_id, node AS neighbor_id, sim,
         |          row_number() OVER (PARTITION BY qid
         |            ORDER BY sim DESC, node ASC) AS rank
         |        FROM zb2 WHERE node <> qid)
         |SELECT query_id, neighbor_id, sim, rank FROM fin WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin)
}
