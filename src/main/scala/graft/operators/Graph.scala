package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation. Connected components
  * live in [[Dedup.canonicalizeCc]]; this hosts the ranking side —
  * domain/page authority as a quality-weighting signal (the classic
  * PageRank prior: rank sources, then weight or filter their documents
  * during mixing).
  */
object Graph {

  /** PageRank in INTEGER MICRO-UNITS — the q63/q64 float-replay trick
    * applied to an iterative algorithm: ranks are longs (1.0 =
    * 1,000,000), each round is
    *   rank' = (1-d)·1e6 + (d_pct · Σ_in floor(rank/outdeg)) div 100
    * so every operation is exact integer arithmetic, reproducible
    * bit-for-bit in any engine (the oracle unrolls rounds as CTEs) —
    * a float formulation would diverge across engines on the
    * order-dependent neighbor sum. The truncation loses ≤ outdeg
    * micro-units per node per round: negligible at this unit scale,
    * and deterministic.
    *
    * Scale shape: each round is one co-keyed join (edges ⋈ ranks on
    * src — both sides partition by src; outdeg rides the same key) and
    * one dst-keyed aggregate with map-side combine — the standard
    * iterative-join PageRank plan. Lineage is cut with a lazy
    * localCheckpoint per round (canonicalizeCc rationale). Dangling
    * nodes (no out-edges) keep receiving rank but redistribute none —
    * the usual simplification; add a dangling-mass term if the graph
    * has many sinks. Output: (node, rank_micro). */
  def pagerankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("n"))
    val base = lit((100 - dampingPct) * 10000L) // (1-d) · 1e6
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("rank_micro div n").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (base + expr(s"coalesce(s, 0L) * $dampingPct div 100"))
            .as("rank_micro"))
        .localCheckpoint(false)
    }
    e.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
