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

/** Gate registry, the retrieval ladder (ColBERT-style late
  * interaction, PLAID MaxSim composition, token-level candidates,
  * MMR diversity, ranked-retrieval eval metrics) — moved verbatim
  * out of GatesSimilarity at round 15 (registry growth watch; zero
  * behavior change, every entry byte-identical at split time).
  * SparkEntry concatenates the family maps back into the driver
  * contract.
  */
private[graft] object GatesRetrieval {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

// LATE-INTERACTION retrieval (round 13) — ColBERT MaxSim (Khattab
    // & Zaharia 2020): docs and queries are BAGS of token vectors
    // (vec_id div 20 groups the embeddings into 20-token docs),
    // score(q, d) = sum over query tokens of the max 6-dp-micro
    // cosine against d's tokens. The oracle replays the pair scores,
    // the per-token max, the integer sum, and the rank.
    "q348_late_interaction" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dt = emb.select(expr("vec_id div 20").as("doc_id"),
        col("vec_id"), col("embedding"))
      val qt = dt.where(col("doc_id") % 10 === 0)
      Knn.lateInteractionTopK(dt, "doc_id", "embedding",
        qt, "doc_id", "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),

// MMR diversity-aware re-rank (round 13) — Carbonell & Goldstein
    // 1998: brute-force top-20 per query is the relevance shortlist,
    // then 5 greedy rounds pick argmax of lambda*rel -
    // (1-lambda)*max-sim-to-picked (integer micros, ties id ASC). The
    // oracle unrolls every round; the ordered-fold cosine keeps the
    // argmax boundary identical cross-engine.
    "q349_mmr_select" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      val cand = Knn.bruteForce(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("neighbor_id").as("id"),
          round(col("sim") * 1e6).cast("long").as("rel"))
        .join(emb.select(col("vec_id").as("id"),
          col("embedding").as("vec")), Seq("id"))
      Knn.mmrSelect(cand, "query_id", "id", "rel", "vec", k = 5,
        lambdaMicro = 700000L)
        .orderBy("query_id", "rank")
    }),

// ANN-SHORTLIST → exact MaxSim RE-RANK (round 14, r13 verdict ask
    // #5 — the PLAID/ColBERTv2 composition closing the retrieval
    // ladder at scale): token bags pool into exact integer-milli
    // vectors (order-independent, cosine is scale-invariant), a
    // persisted IVF store over the pooled vectors produces a top-10
    // candidate set per query, and q348's exact MaxSim arithmetic
    // re-ranks ONLY those pairs — corpus tokens are scanned once,
    // pruned by the broadcast candidate list. q348 stays the exact
    // brute-force baseline; this is the production path.
    "q354_plaid_maxsim" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dt = emb.select(expr("vec_id div 20").as("doc_id"),
        col("vec_id"), col("embedding"))
      val qt = dt.where(col("doc_id") % 10 === 0)
      val pooled = Knn.poolTokens(dt, "doc_id", "embedding")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_plaid_gate").toString
      Knn.writeIvfIndex(pooled, "id", "vec", tmp, c = 8,
        portableHash = true)
      val cands = Knn.searchIvf(s, tmp, pooled.where(col("id") % 10 === 0),
        "id", "vec", k = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id").as("doc_id"))
      Knn.lateInteractionRerank(dt, "doc_id", "embedding",
        qt, "doc_id", "vec_id", "embedding", cands, k = 5)
        .orderBy("query_id", "rank")
    }),

// TOKEN-LEVEL candidate generation (round 14 — the ColBERTv2
    // retrieval shape proper, complementing q354's pooled shortlist):
    // the IVF store indexes TOKENS; each query token retrieves its
    // top-8 nearest tokens (nprobe=2), retrieved tokens map to their
    // owning docs (vec_id div 20 — the corpus grouping), and the
    // distinct (query_doc, cand_doc) union re-ranks under exact
    // MaxSim. Fine-grained token matches surface docs a pooled
    // vector blurs away — the standard two-stage multi-vector design.
    "q356_colbert_candidates" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dt = emb.select(expr("vec_id div 20").as("doc_id"),
        col("vec_id"), col("embedding"))
      val qt = dt.where(col("doc_id") % 10 === 0)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_colbert_gate").toString
      Knn.writeIvfIndex(emb, "vec_id", "embedding", tmp, c = 16,
        portableHash = true)
      val tokHits = Knn.searchIvf(s, tmp,
        qt.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 8, nprobe = 2)
      val cands = tokHits
        .select(expr("query_id div 20").as("query_id"),
          expr("neighbor_id div 20").as("doc_id"))
        .where(col("query_id") =!= col("doc_id")).distinct()
      Knn.lateInteractionRerank(dt, "doc_id", "embedding",
        qt, "doc_id", "vec_id", "embedding", cands, k = 5)
        .orderBy("query_id", "rank")
    }),

// Ranked-retrieval EVAL metrics (round 14): the measurement loop
    // for the whole index family as a first-class operator — IVF
    // (nprobe=4) is the SYSTEM, brute force the TRUTH, and recall@5 /
    // MRR / AP@5 come out per query in exact integer micros
    // (truncating division on both engines). The oracle replays both
    // retrieval chains and the same integer metric algebra.
    "q355_retrieval_metrics" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      val sys = Knn.ivf(emb, "vec_id", "embedding", queries,
          "vec_id", "embedding", k = 5, c = 16, nprobe = 4,
          portableHash = true)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      val truth = Knn.bruteForce(emb, "vec_id", "embedding", queries,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id").as("doc_id"))
      Knn.retrievalMetrics(sys, truth, k = 5).orderBy("query_id")
    }),

    // GRAPH store as the late-interaction candidate generator (round
    // 15, r14 verdict ask #3 — q354 composes only through the IVF
    // store; the graph family reaches IVF-or-better recall at equal
    // memory, so it must feed the same re-rank): poolTokens →
    // writeGraphIndex over the pooled vectors → beam-walk shortlist
    // (searchGraphIndex, beam=10 hops=2, top-10 candidate docs) →
    // exact MaxSim re-rank over ONLY the candidates' token pairs.
    // The oracle replays the pooled build, the graph edge build, the
    // beam walk (q347's CTE chain parameterized over the pooled
    // member) and q354's MaxSim tail.
    "q359_graph_plaid_maxsim" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val dt = emb.select(expr("vec_id div 20").as("doc_id"),
        col("vec_id"), col("embedding"))
      val qt = dt.where(col("doc_id") % 10 === 0)
      val pooled = Knn.poolTokens(dt, "doc_id", "embedding")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_graph_plaid_gate").toString
      Knn.writeGraphIndex(pooled, "id", "vec", tmp, k = 3, c = 8,
        nprobe = 2, portableHash = true)
      val cands = Knn.searchGraphIndex(s, tmp,
          pooled.where(col("id") % 10 === 0), "id", "vec",
          beam = 10, hops = 2, k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"))
      Knn.lateInteractionRerank(dt, "doc_id", "embedding",
        qt, "doc_id", "vec_id", "embedding", cands, k = 5)
        .orderBy("query_id", "rank")
    }),

    // NDCG@k with GRADED relevance (round 15, r14 verdict ask #5):
    // truth carries grade = 6 - brute-force-rank (5 = best), NDCG
    // weights come from the FROZEN integer-micro lookup table
    // (Knn.DcgWeightsMicro — no runtime transcendental math on
    // either engine), and the system side DROPS every query in one
    // residue class, gating the truth-driven zero rows (r14 advice:
    // a query with no results must emit all-zero metrics, not
    // vanish).
    "q360_ndcg_graded" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") % 100 === 0)
      val sys = Knn.ivf(emb, "vec_id", "embedding", queries,
          "vec_id", "embedding", k = 5, c = 16, nprobe = 4,
          portableHash = true)
        .where(expr("(query_id div 100) % 7 != 3"))
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      val truth = Knn.bruteForce(emb, "vec_id", "embedding", queries,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          (lit(6L) - col("rank")).as("grade"))
      Knn.retrievalMetrics(sys, truth, k = 5).orderBy("query_id")
    }))

  val oracles: Map[String, String] = Map(

// Both retrieval chains (IVF system, brute-force truth) + the
    // integer metric algebra: hits join, running-precision window,
    // truncating-division micros on both engines.
    "q355_retrieval_metrics" ->
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
         |iscored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |sys AS (
         |  SELECT query_id, neighbor_id AS doc_id, rank FROM (
         |    SELECT query_id, neighbor_id, sim,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM iscored) r WHERE rank <= 5),
         |bscored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM embeddings e
         |  JOIN embeddings q ON q.vec_id % 100 = 0
         |                   AND e.vec_id <> q.vec_id),
         |truth AS (
         |  SELECT query_id, neighbor_id AS doc_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM bscored) r WHERE rank <= 5),
         |hitj AS (
         |  SELECT s.query_id, s.rank,
         |    CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM sys s LEFT JOIN truth t
         |    ON t.query_id = s.query_id AND t.doc_id = s.doc_id),
         |cum AS (
         |  SELECT query_id, rank, hit,
         |    SUM(hit) OVER (PARTITION BY query_id ORDER BY rank) AS cum
         |  FROM hitj),
         |wt(r, w) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |             (4, 430676), (5, 386852)),
         |per AS (
         |  SELECT c.query_id, CAST(SUM(c.hit) AS BIGINT) AS hits,
         |    MIN(CASE WHEN c.hit = 1 THEN c.rank END) AS fr,
         |    CAST(SUM(c.hit * ((c.cum * 1000000) // c.rank)) AS BIGINT)
         |      AS apnum,
         |    CAST(SUM(c.hit * w.w) AS BIGINT) AS dcg
         |  FROM cum c JOIN wt w ON w.r = c.rank GROUP BY c.query_id),
         |nt AS (SELECT query_id, COUNT(*) AS n_truth FROM truth
         |       GROUP BY query_id),
         |ideal AS (
         |  SELECT nt.query_id, CAST(SUM(w.w) AS BIGINT) AS idcg
         |  FROM nt JOIN wt w ON w.r <= LEAST(nt.n_truth, 5)
         |  GROUP BY nt.query_id)
         |SELECT nt.query_id, CAST(nt.n_truth AS BIGINT) AS n_truth,
         |  CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits,
         |  CAST(COALESCE((p.hits * 1000000) // nt.n_truth, 0) AS BIGINT)
         |    AS recall_micro,
         |  CAST(COALESCE(1000000 // p.fr, 0) AS BIGINT) AS mrr_micro,
         |  CAST(COALESCE(p.apnum // LEAST(nt.n_truth, 5), 0) AS BIGINT)
         |    AS ap_micro,
         |  CAST(COALESCE((p.dcg * 1000000) // NULLIF(i.idcg, 0), 0)
         |    AS BIGINT) AS ndcg_micro
         |FROM nt LEFT JOIN per p ON p.query_id = nt.query_id
         |        JOIN ideal i ON i.query_id = nt.query_id
         |ORDER BY nt.query_id""".stripMargin,

// Pooled vectors (q354's mv/pooled), graph edge build + beam walk
    // over the POOLED member (q347's CTE chain parameterized), top-10
    // candidate docs, then q354's exact-MaxSim micros tail.
    "q359_graph_plaid_maxsim" ->
      s"""WITH dt AS (
         |  SELECT vec_id // 20 AS doc_id, vec_id, embedding
         |  FROM embeddings),
         |mv AS (
         |  SELECT doc_id, d,
         |    CAST(SUM(CAST(ROUND(1000 * CAST(embedding[d] AS DOUBLE))
         |      AS BIGINT)) AS BIGINT) AS s
         |  FROM dt CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
         |  GROUP BY doc_id, d),
         |pooled AS (
         |  SELECT doc_id AS id, list(CAST(s AS DOUBLE) ORDER BY d) AS vec
         |  FROM mv GROUP BY doc_id),
         |phs AS (
         |  SELECT id, vec, ${md5Hash64Sql("CAST(id AS VARCHAR)")} AS h
         |  FROM pooled),
         |${layerKnnGraphCtes("g", "phs", 8, 2, 3)},
         |gent AS (SELECT cell, MIN(id) AS node FROM gcells GROUP BY cell),
         |gv AS (SELECT id AS node, CAST(vec AS DOUBLE[]) AS nvec FROM phs),
         |sq AS (SELECT id AS qid, CAST(vec AS DOUBLE[]) AS qvec
         |       FROM pooled WHERE id % 10 = 0),
         |${graphBeamCtes("z", "sq", "gv", "ge", "gent", beam = 10, hops = 2)},
         |cand AS MATERIALIZED (
         |  SELECT query_id, doc_id FROM (
         |    SELECT qid AS query_id, node AS doc_id,
         |      row_number() OVER (PARTITION BY qid
         |                         ORDER BY sim DESC, node ASC) AS rn
         |    FROM zb2 WHERE node <> qid) x WHERE rn <= 10),
         |qt AS (
         |  SELECT doc_id AS query_id, vec_id AS tok, embedding AS qvec
         |  FROM dt WHERE doc_id % 10 = 0),
         |pair AS (
         |  SELECT c.query_id, q.tok, c.doc_id,
         |    CAST(ROUND(1e6 * ROUND(${cosSql("d.embedding", "q.qvec")}, 6))
         |      AS BIGINT) AS m
         |  FROM cand c
         |  JOIN dt d ON d.doc_id = c.doc_id
         |  JOIN qt q ON q.query_id = c.query_id
         |  WHERE c.doc_id <> c.query_id),
         |mx AS (
         |  SELECT query_id, tok, doc_id, MAX(m) AS mx
         |  FROM pair GROUP BY query_id, tok, doc_id),
         |sc AS (
         |  SELECT query_id, doc_id, CAST(SUM(mx) AS BIGINT) AS score_micro
         |  FROM mx GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, score_micro,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_micro DESC, doc_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, doc_id, score_micro, rank FROM ranked
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// q355's retrieval chains with GRADED truth (grade = 6 - rank), the
    // frozen micro weight table, ideal-DCG over grades sorted (grade
    // DESC, doc_id) and a dropped system residue class — the oracle
    // emits all-zero rows for those queries from the truth side.
    "q360_ndcg_graded" ->
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
         |iscored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |sys AS (
         |  SELECT query_id, neighbor_id AS doc_id, rank FROM (
         |    SELECT query_id, neighbor_id, sim,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM iscored) r
         |  WHERE rank <= 5 AND (query_id // 100) % 7 <> 3),
         |bscored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim
         |  FROM embeddings e
         |  JOIN embeddings q ON q.vec_id % 100 = 0
         |                   AND e.vec_id <> q.vec_id),
         |truth AS (
         |  SELECT query_id, neighbor_id AS doc_id, 6 - rank AS grade
         |  FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM bscored) r WHERE rank <= 5),
         |hitj AS (
         |  SELECT s.query_id, s.rank,
         |    CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS hit,
         |    COALESCE(t.grade, 0) AS grade
         |  FROM sys s LEFT JOIN truth t
         |    ON t.query_id = s.query_id AND t.doc_id = s.doc_id),
         |cum AS (
         |  SELECT query_id, rank, hit, grade,
         |    SUM(hit) OVER (PARTITION BY query_id ORDER BY rank) AS cum
         |  FROM hitj),
         |wt(r, w) AS (VALUES (1, 1000000), (2, 630929), (3, 500000),
         |             (4, 430676), (5, 386852)),
         |per AS (
         |  SELECT c.query_id, CAST(SUM(c.hit) AS BIGINT) AS hits,
         |    MIN(CASE WHEN c.hit = 1 THEN c.rank END) AS fr,
         |    CAST(SUM(c.hit * ((c.cum * 1000000) // c.rank)) AS BIGINT)
         |      AS apnum,
         |    CAST(SUM(c.grade * w.w) AS BIGINT) AS dcg
         |  FROM cum c JOIN wt w ON w.r = c.rank GROUP BY c.query_id),
         |nt AS (SELECT query_id, COUNT(*) AS n_truth FROM truth
         |       GROUP BY query_id),
         |trk AS (
         |  SELECT query_id, grade,
         |    row_number() OVER (PARTITION BY query_id
         |                       ORDER BY grade DESC, doc_id) AS r
         |  FROM truth),
         |ideal AS (
         |  SELECT t.query_id, CAST(SUM(t.grade * w.w) AS BIGINT) AS idcg
         |  FROM trk t JOIN wt w ON w.r = t.r WHERE t.r <= 5
         |  GROUP BY t.query_id)
         |SELECT nt.query_id, CAST(nt.n_truth AS BIGINT) AS n_truth,
         |  CAST(COALESCE(p.hits, 0) AS BIGINT) AS hits,
         |  CAST(COALESCE((p.hits * 1000000) // nt.n_truth, 0) AS BIGINT)
         |    AS recall_micro,
         |  CAST(COALESCE(1000000 // p.fr, 0) AS BIGINT) AS mrr_micro,
         |  CAST(COALESCE(p.apnum // LEAST(nt.n_truth, 5), 0) AS BIGINT)
         |    AS ap_micro,
         |  CAST(COALESCE((p.dcg * 1000000) // NULLIF(i.idcg, 0), 0)
         |    AS BIGINT) AS ndcg_micro
         |FROM nt LEFT JOIN per p ON p.query_id = nt.query_id
         |        JOIN ideal i ON i.query_id = nt.query_id
         |ORDER BY nt.query_id""".stripMargin,

// Pair micros -> per-query-token MAX -> integer SUM -> rank; the
    // HUGEINT sum casts back to BIGINT (the decSum convention).
    "q348_late_interaction" ->
      s"""WITH dt AS (
         |  SELECT vec_id // 20 AS doc_id, vec_id, embedding
         |  FROM embeddings),
         |qt AS (
         |  SELECT doc_id AS query_id, vec_id AS tok, embedding AS qvec
         |  FROM dt WHERE doc_id % 10 = 0),
         |pair AS (
         |  SELECT q.query_id, q.tok, d.doc_id,
         |    CAST(ROUND(1e6 * ROUND(${cosSql("d.embedding", "q.qvec")}, 6))
         |      AS BIGINT) AS m
         |  FROM dt d JOIN qt q ON d.doc_id <> q.query_id),
         |mx AS (
         |  SELECT query_id, tok, doc_id, MAX(m) AS mx
         |  FROM pair GROUP BY query_id, tok, doc_id),
         |sc AS (
         |  SELECT query_id, doc_id, CAST(SUM(mx) AS BIGINT) AS score_micro
         |  FROM mx GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, score_micro,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_micro DESC, doc_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, doc_id, score_micro, rank FROM ranked
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// Brute top-20 shortlist, then the unrolled greedy rounds.
    "q349_mmr_select" ->
      s"""WITH scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS id,
         |    ROUND(${cosSql("e.embedding", "q.embedding")}, 6) AS sim,
         |    CAST(e.embedding AS DOUBLE[]) AS vec
         |  FROM embeddings e
         |  JOIN embeddings q ON q.vec_id % 100 = 0
         |                   AND e.vec_id <> q.vec_id),
         |cand AS MATERIALIZED (
         |  SELECT query_id, id, CAST(ROUND(sim * 1e6) AS BIGINT) AS rel,
         |         vec
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY sim DESC, id ASC) AS rn FROM scored)
         |  WHERE rn <= 20),
         |${mmrRoundCtes("g", "cand", k = 5, lambdaMicro = 700000L)}
         |SELECT query_id, id, rank FROM ga5
         |ORDER BY query_id, rank""".stripMargin,

// Pooled integer-milli vectors → q72's probe chain over them
    // (c=8 centroids from the pooled table's own bottom-8 md5) →
    // top-10 candidate docs → q348's MaxSim micros restricted to the
    // candidate pairs.
    "q354_plaid_maxsim" ->
      s"""WITH dt AS (
         |  SELECT vec_id // 20 AS doc_id, vec_id, embedding
         |  FROM embeddings),
         |mv AS (
         |  SELECT doc_id, d,
         |    CAST(SUM(CAST(ROUND(1000 * CAST(embedding[d] AS DOUBLE))
         |      AS BIGINT)) AS BIGINT) AS s
         |  FROM dt CROSS JOIN (SELECT unnest(range(1, 65)) AS d) dd
         |  GROUP BY doc_id, d),
         |pooled AS (
         |  SELECT doc_id AS id, list(CAST(s AS DOUBLE) ORDER BY d) AS vec
         |  FROM mv GROUP BY doc_id),
         |hashed AS (
         |  SELECT id, vec, ${md5Hash64Sql("CAST(id AS VARCHAR)")} AS h
         |  FROM pooled),
         |cents AS (
         |  SELECT h AS cell, vec AS cvec FROM hashed ORDER BY h LIMIT 8),
         |assign AS (
         |  SELECT hd.id, hd.vec, c.cell,
         |    row_number() OVER (PARTITION BY hd.id
         |      ORDER BY list_cosine_similarity(hd.vec, c.cvec) DESC,
         |               c.cell DESC) AS rn
         |  FROM hashed hd CROSS JOIN cents c),
         |cells AS (SELECT id, vec, cell FROM assign WHERE rn = 1),
         |qa AS (
         |  SELECT query_id, qvec, cell FROM (
         |    SELECT q.id AS query_id, q.vec AS qvec, c.cell,
         |      row_number() OVER (PARTITION BY q.id
         |        ORDER BY list_cosine_similarity(q.vec, c.cvec) DESC,
         |                 c.cell DESC) AS rk
         |    FROM pooled q CROSS JOIN cents c WHERE q.id % 10 = 0) x
         |  WHERE rk <= 4),
         |cscored AS (
         |  SELECT qa.query_id, cl.id AS doc_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |cand AS MATERIALIZED (
         |  SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, doc_id ASC) AS rn
         |    FROM cscored) x WHERE rn <= 10),
         |qt AS (
         |  SELECT doc_id AS query_id, vec_id AS tok, embedding AS qvec
         |  FROM dt WHERE doc_id % 10 = 0),
         |pair AS (
         |  SELECT c.query_id, q.tok, c.doc_id,
         |    CAST(ROUND(1e6 * ROUND(${cosSql("d.embedding", "q.qvec")}, 6))
         |      AS BIGINT) AS m
         |  FROM cand c
         |  JOIN dt d ON d.doc_id = c.doc_id
         |  JOIN qt q ON q.query_id = c.query_id
         |  WHERE c.doc_id <> c.query_id),
         |mx AS (
         |  SELECT query_id, tok, doc_id, MAX(m) AS mx
         |  FROM pair GROUP BY query_id, tok, doc_id),
         |sc AS (
         |  SELECT query_id, doc_id, CAST(SUM(mx) AS BIGINT) AS score_micro
         |  FROM mx GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, score_micro,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_micro DESC, doc_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, doc_id, score_micro, rank FROM ranked
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

// Token-level IVF probe chain (q72's shape, queries = the query
    // docs' tokens, rn <= 8 at nprobe 2), token→doc mapping, distinct
    // candidate union minus self, then q348's MaxSim micros over the
    // candidate pairs.
    "q356_colbert_candidates" ->
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
         |    FROM embeddings q CROSS JOIN cents c
         |    WHERE (q.vec_id // 20) % 10 = 0) x
         |  WHERE rk <= 2),
         |tscored AS (
         |  SELECT qa.query_id, cl.id AS neighbor_id,
         |    ROUND(${cosSql("cl.vec", "qa.qvec")}, 6) AS sim
         |  FROM cells cl JOIN qa ON cl.cell = qa.cell
         |  WHERE cl.id <> qa.query_id),
         |tokhits AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
         |    FROM tscored) r WHERE rank <= 8),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT query_id // 20 AS query_id,
         |         neighbor_id // 20 AS doc_id
         |  FROM tokhits WHERE query_id // 20 <> neighbor_id // 20),
         |dt AS (
         |  SELECT vec_id // 20 AS doc_id, vec_id, embedding
         |  FROM embeddings),
         |qt AS (
         |  SELECT doc_id AS query_id, vec_id AS tok, embedding AS qvec
         |  FROM dt WHERE doc_id % 10 = 0),
         |pair AS (
         |  SELECT c.query_id, q.tok, c.doc_id,
         |    CAST(ROUND(1e6 * ROUND(${cosSql("d.embedding", "q.qvec")}, 6))
         |      AS BIGINT) AS m
         |  FROM cand c
         |  JOIN dt d ON d.doc_id = c.doc_id
         |  JOIN qt q ON q.query_id = c.query_id
         |  WHERE c.doc_id <> c.query_id),
         |mx AS (
         |  SELECT query_id, tok, doc_id, MAX(m) AS mx
         |  FROM pair GROUP BY query_id, tok, doc_id),
         |sc AS (
         |  SELECT query_id, doc_id, CAST(SUM(mx) AS BIGINT) AS score_micro
         |  FROM mx GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, score_micro,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_micro DESC, doc_id ASC) AS rank
         |  FROM sc)
         |SELECT query_id, doc_id, score_micro, rank FROM ranked
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin)
}
