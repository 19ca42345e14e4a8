package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    *   rank' = (1-d)·1e6 + (d_pct · (Σ_in floor(rank/outdeg) + dang)) div 100
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
    * localCheckpoint per round (canonicalizeCc rationale).
    *
    * `dangling = true` redistributes sink mass: each round the rank
    * held by nodes with no out-edges is summed (a 1-row aggregate that
    * rides into the update as a broadcast cross join — no driver
    * round-trip) and every node receives floor(danglingSum / N) inside
    * the damped term, so total rank stays ≈ N·1e6 instead of leaking
    * out of every sink. Off by default (the usual simplification, and
    * q94's gated form).
    *
    * `convergeEarly = true` stops before `iters` once a round is a
    * FIXPOINT: a (sum, hash-sum) signature of the rank table is
    * collected per round — the same collect materializes the lazy
    * checkpoint, so it costs no extra job (canonicalizeCc pattern) —
    * and equality with the previous round's signature ends the loop.
    * Integer truncation can in principle oscillate with period > 1;
    * `iters` stays the hard bound. Off by default: a data-dependent
    * round count is not SQL-replayable, so gated queries run fixed
    * rounds.
    *
    * Output: (node, rank_micro). */
  def pagerankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int, dampingPct: Int = 85,
                  dangling: Boolean = false,
                  convergeEarly: Boolean = false): DataFrame =
    pagerankIntRounds(edges, srcCol, dstCol, iters, dampingPct,
      dangling, convergeEarly)._1

  /** [[pagerankInt]] plus the number of rounds actually run (== iters
    * unless convergeEarly stopped at a fixpoint). */
  private[graft] def pagerankIntRounds(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPct: Int = 85,
      dangling: Boolean = false,
      convergeEarly: Boolean = false): (DataFrame, Int) = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(lvl)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("n")).persist(lvl)
    val nNodes = if (dangling) nodes.count() else 0L
    val base = lit((100 - dampingPct) * 10000L) // (1-d) · 1e6
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    var prevSig: Option[(Long, Long)] = None
    // previous round's checkpoint — freed as soon as the next round is
    // materialized, so block residue stays O(1) rounds, not O(iters)
    var prevCp: Option[DataFrame] = None
    var round = 0
    var stop = false
    while (round < iters && !stop) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("rank_micro div n").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      val joined = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
      val next =
        if (dangling) {
          val dang = ranks
            .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
            .agg(coalesce(sum("rank_micro"), lit(0L)).as("ds"))
          joined.crossJoin(broadcast(dang))
            .select(col("node"),
              (base + expr(
                s"(coalesce(s, 0L) + (ds div ${nNodes}L)) * $dampingPct div 100"))
                .as("rank_micro"))
        } else {
          joined.select(col("node"),
            (base + expr(s"coalesce(s, 0L) * $dampingPct div 100"))
              .as("rank_micro"))
        }
      // convergeEarly: the signature collect materializes a LAZY
      // checkpoint (no extra job). Fixed-rounds: checkpoint EAGERLY so
      // the previous round's blocks can be freed now instead of
      // accumulating until the caller's first action (one cheap count
      // job per round, reading this round's freshly cached blocks).
      ranks = next.localCheckpoint(!convergeEarly)
      round += 1
      if (convergeEarly) {
        val sig = ranks.agg(
          sum("rank_micro").cast("long").as("s"),
          sum(xxhash64(col("node"), col("rank_micro"))).as("h")).collect()(0)
        val cur = (sig.getLong(0), sig.getLong(1))
        if (prevSig.contains(cur)) stop = true else prevSig = Some(cur)
      }
      prevCp.foreach(graft.plans.Blocks.free)
      prevCp = Some(ranks)
    }
    e.unpersist(false)
    nodes.unpersist(false)
    outdeg.unpersist(false)
    // The FINAL round's checkpoint backs the returned frame; the caller
    // (or graft.plans.Blocks.releaseAll at a query boundary) frees it.
    (ranks, round)
  }

  /** Personalized PageRank in integer micro-units — [[pagerankInt]]'s
    * exact-replay discipline with the teleport mass concentrated on a
    * SEED set (Haveliwala 2002, "Topic-sensitive PageRank"; the
    * random-walk-with-restart relevance): each round
    *   rank' = [node ∈ S] · (((100−d)·10⁴·N) div |S|)
    *           + (d · Σ_in floor(rank/outdeg)) div 100
    * — total teleport mass matches pagerankInt's (1−d)·N·10⁶ but
    * flows only through the seeds, so rank concentrates in the seeds'
    * link neighborhood: the expansion step that turns a curated
    * whitelist (trusted domains, verified sources) into a ranked
    * crawl/keep frontier. Start vector is uniform 10⁶ (fixed-round
    * gates replay it; the limit is seed-relative regardless of
    * start). Scale shape identical to pagerankInt: one co-keyed join
    * plus one keyed aggregate per round, per-round eager checkpoints,
    * superseded blocks freed immediately.
    * Output: (node, rank_micro). */
  def personalizedPagerankInt(edges: DataFrame, srcCol: String,
                              dstCol: String, seeds: DataFrame,
                              seedCol: String, iters: Int,
                              dampingPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist(lvl)
    val seedSet = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(seedSet.withColumn("__s", lit(1)), Seq("node"), "left")
      .persist(lvl)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("n")).persist(lvl)
    val nNodes = nodes.count()
    val nSeeds = nodes.where(col("__s") === 1).count()
    require(nSeeds > 0, "no seed appears in the edge set")
    val baseSeed = (100L - dampingPct) * 10000L * nNodes / nSeeds
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    var prevCp: Option[DataFrame] = None
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst"), expr("rank_micro div n").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      val next = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (when(col("__s") === 1, lit(baseSeed)).otherwise(lit(0L)) +
            expr(s"coalesce(s, 0L) * $dampingPct div 100"))
            .as("rank_micro"))
      ranks = next.localCheckpoint(true)
      prevCp.foreach(graft.plans.Blocks.free)
      prevCp = Some(ranks)
    }
    e.unpersist(false)
    nodes.unpersist(false)
    outdeg.unpersist(false)
    ranks
  }

  /** Synchronous label-propagation community detection (Raghavan,
    * Albert & Kumara 2007, "Near linear time algorithm to detect
    * community structures") made DETERMINISTIC: labels start as node
    * ids; each round every node adopts the MODE of its neighbors'
    * labels with the fixed tie-break (count desc, label asc) — the
    * random tie-breaks and asynchronous sweep of the original are
    * exactly what a replayable engine cannot ship. Fixed `rounds`
    * (data-dependent convergence is not SQL-replayable; label
    * cycling, LPA's known pathology under synchronous update, is
    * bounded by the round budget either way). Edges are symmetrized
    * and self-loops dropped.
    *
    * Scale shape: per round, one co-keyed edges ⋈ labels join, one
    * (node, label) count aggregate, and a per-node top-1 cut via
    * max_by-style struct max — map-side combinable, no row-scale
    * window. Per-round eager checkpoints (pagerankIntRounds
    * rationale). Output: (node, label). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = e0.unionByName(e0.select(col("dst").as("src"),
        col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
      .persist(lvl)
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var prevCp: Option[DataFrame] = None
    for (_ <- 1 to rounds) {
      val counts = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      // top-1 by (count desc, label asc) as an order-embedding struct
      // max: (c, -label) maximizes exactly that ordering — aggregate,
      // not window, so partials combine map-side
      val next = counts
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      labels = next.localCheckpoint(true)
      prevCp.foreach(graft.plans.Blocks.free)
      prevCp = Some(labels)
    }
    sym.unpersist(false)
    labels
  }

  /** Global clustering coefficient (transitivity; Watts & Strogatz
    * 1998 / Newman 2003 convention): C = 3·triangles / wedges with
    * wedges = Σ_v d_v(d_v−1)/2 — "what fraction of connected triples
    * close?" — the one-number cohesion score composing
    * [[triangleCounts]] (whose m^{3/2} enumeration does the hard
    * part) with one exact degree aggregate. Integers end-to-end; one
    * double division. Output: one row (n_nodes, n_wedges,
    * n_triangles, c_micro — NULL when the graph has no wedges). */
  def clusteringCoeff(edges: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast(dec).as("d"))
    val wedges = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0).cast(dec))
        .as("w"))
    val tri = triangleCounts(und, "u", "v")
      .agg(coalesce(sum("n_triangles"), lit(0L)).as("t3"))
    wedges.crossJoin(tri)
      .select(col("n_nodes"), col("w").cast("long").as("n_wedges"),
        (col("t3") / 3).cast("long").as("n_triangles"),
        when(col("w") > 0,
          round(col("t3").cast("double") / col("w").cast("double") * 1e6)
            .cast("long")).as("c_micro"))
  }

  /** Newman modularity of a node partition (Newman & Girvan 2004,
    * "Finding and evaluating community structure in networks"):
    *   Q = Σ_c [ e_c/m − (d_c/2m)² ]
    * over communities c, with e_c = intra-community edge count, d_c =
    * total degree inside c, m = undirected edge count. THE quality
    * score for a community assignment — grade [[labelPropagation]]'s
    * output (or any clustering projected onto a graph) before
    * trusting it. Closed EXACTLY: Q·4m² = Σ_c (4m·e_c − d_c²) is pure
    * integer (DECIMAL(38,0)); one double division to micros.
    *
    * Scale shape: normalize edges once (dedupe + orient, the
    * [[triangleCounts]] discipline), one join per endpoint against
    * the labels (keys-only), then community-keyed aggregates — no
    * windows, no collect. Nodes missing from `labels` raise (a silent
    * drop would misattribute degree mass).
    * Output: one row (m, n_communities, q_micro). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, nodeCol: String,
                 labelCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    val lab = labels.select(col(nodeCol).cast("long").as("node"),
      col(labelCol).cast("long").as("c"))
    // the missing-endpoint guard rides the cu/cv columns themselves
    // (an unused check column would be pruned and never fire)
    def guarded(c: String) =
      when(col(c).isNull, raise_error(
        lit("modularity: edge endpoint missing from labels")).cast("long"))
        .otherwise(col(c)).as(c)
    val both = und
      .join(lab.select(col("node").as("u"), col("c").as("cu")), Seq("u"), "left")
      .join(lab.select(col("node").as("v"), col("c").as("cv")), Seq("v"), "left")
      .select(col("u"), col("v"), guarded("cu"), guarded("cv"))
    val m = und.count()
    // degree mass per community: each edge adds 1 to both endpoints
    val degByC = both.select(explode(array(col("cu"), col("cv"))).as("c"))
      .groupBy("c").agg(count(lit(1)).cast(dec).as("d"))
    val intraByC = both.where(col("cu") === col("cv"))
      .groupBy(col("cu").as("c")).agg(count(lit(1)).cast(dec).as("e"))
    val terms = degByC.join(intraByC, Seq("c"), "left")
      .select((lit(4L).cast(dec) * lit(m).cast(dec)
        * coalesce(col("e"), lit(0).cast(dec))
        - col("d") * col("d")).as("t"))
    terms.agg(count(lit(1)).as("n_communities"),
        coalesce(sum("t"), lit(0).cast(dec)).as("num"))
      .select(lit(m).as("m"), col("n_communities"),
        when(lit(m) > 0,
          round(col("num").cast("double")
            / (lit(4.0) * lit(m).cast("double") * lit(m).cast("double"))
            * 1e6).cast("long")).as("q_micro"))
  }

  /** Degree assortativity coefficient (Newman 2002, "Assortative
    * mixing in networks"): the Pearson correlation of degrees across
    * edge endpoints — positive on social-style graphs (hubs link
    * hubs), negative on web/biology-style hub-and-spoke graphs. The
    * one-number mixing diagnostic next to [[degreeDistribution]].
    * Computed over the SYMMETRIZED edge list (each undirected edge
    * contributes both orientations, the standard convention, so the
    * two marginals coincide); degree products are exact
    * DECIMAL(38,0) sums; one fixed-order float close. Output: one
    * row (m, r_micro — NULL when the degree variance is 0). */
  def assortativity(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val sym = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
    val withDeg = sym
      .join(deg.select(col("node").as("u"), col("d").as("dx")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dy")), Seq("v"))
    val x = col("dx").cast(dec)
    val y = col("dy").cast(dec)
    val agg = withDeg.agg(count(lit(1)).as("n2"),
      sum(x).as("sx"), sum(x * x).as("sxx"),
      sum(x * y).as("sxy"))
    def d(c: String) = col(c).cast("double")
    // both marginals equal by symmetry: r = (n·Σxy − (Σx)²) /
    // (n·Σx² − (Σx)²)
    val num = d("n2") * d("sxy") - d("sx") * d("sx")
    val den = d("n2") * d("sxx") - d("sx") * d("sx")
    agg.select((col("n2") / 2).cast("long").as("m"),
      when(den > 0, round(num / den * 1e6).cast("long")).as("r_micro"))
  }

  /** Exact triangle count per node via the degree-ordered
    * node-iterator (Schank–Wagner / Cohen's MapReduce form): orient
    * every undirected edge from the (degree, id)-smaller endpoint to
    * the larger, enumerate wedges only at each edge's SMALLER
    * endpoint, and close them against the oriented edge set. The
    * orientation caps a node's oriented out-degree at O(√m) on any
    * graph — the wedge explosion a hub would cause under naive
    * enumeration (deg² pairs at the hub) becomes m^{3/2} total work,
    * the optimal bound for exact counting.
    *
    * Input may contain duplicates, self-loops, or both directions of
    * an edge; all are normalized away first. The oriented edge list is
    * MATERIALIZED once (eager localCheckpoint, m rows of two longs):
    * the downstream plan references it four times (both wedge sides
    * and both close-union sides), and without the cut each reference
    * re-plans the whole dedupe+degree+orient subtree — ~70 exchanges
    * in the physical plan vs ~6 with it. The returned frame reads the
    * checkpoint's blocks; free them at a query boundary
    * ([[graft.plans.Blocks.releaseAll]]) once consumed.
    *
    * Output: (node, n_triangles) for every node in ≥1 triangle, each
    * triangle credited to all three corners. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (degree, id): lower endpoint keeps the out-edge
    val oriented = und
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint(true)
    // wedges at the small endpoint: a→b, a→c with b < c, closed by b→c
    val w1 = oriented.select(col("a"), col("b"))
    val w2 = oriented.select(col("a").as("a2"), col("b").as("c"))
    val wedges = w1.join(w2, col("a") === col("a2") && col("b") < col("c"))
      .select(col("a"), col("b"), col("c"))
    val closed = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")).unionByName(
        oriented.select(col("a").as("c"), col("b").as("b"))),
      Seq("b", "c"))
    closed.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition (membership for a fixed k): iteratively peel
    * every node of degree < k until the remainder is stable — the
    * classic density filter for link graphs (a page inside a k-core
    * sits in a tightly-linked cluster: navigation boilerplate, spam
    * farms, genuine hubs — all of which mixing policies want flagged).
    *
    * Each round is one degree aggregate + one co-keyed semi-join pair
    * (both keyed on the endpoint — map-side combine, no windows, no
    * neighborhood collection, so hubs never serialize onto one task);
    * convergence is edge-count equality (peeling is monotone — equal
    * count ⇒ fixpoint), rounds bounded by `maxIters` far above the
    * O(√m) peel-depth bound of real graphs. Lineage cut per round
    * (lazy localCheckpoint, [[Dedup.canonicalizeCc]] rationale).
    *
    * Input edges are undirected (symmetrized internally, self-loops
    * dropped). Output: (id, degree) for surviving nodes — degree
    * counted inside the k-core. */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      // canonical undirected form BEFORE distinct — a reverse
      // duplicate must not double a node's degree
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(false)
    var n = e.count()
    var it = 0
    var converged = n == 0
    while (!converged && it < maxIters) {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select("u")
      val next = e
        .join(keep, Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("u", "v"), Seq("v"), "left_semi")
        .select("u", "v")
        .localCheckpoint(false)
      val m = next.count()
      graft.plans.Blocks.free(e)
      e = next
      converged = m == n
      n = m
      it += 1
    }
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy(col("u").as("id")).agg(count(lit(1)).as("degree"))
  }

  /** Multi-source BFS distances: hop count from the nearest source
    * for every reachable node — the reachability/taint-propagation
    * primitive (spam-seed distance, crawl-frontier depth, citation
    * radius). Frontier expansion with a global distance table:
    * each round joins the frontier to the symmetrized edge list
    * (co-keyed on the frontier node) and anti-joins already-settled
    * nodes; rounds = graph diameter from the sources, each one
    * shuffle pair. The distance table and frontier are checkpointed
    * per round, superseded blocks freed.
    *
    * Output: (id, dist) — sources at 0; unreachable nodes absent. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   sources: DataFrame, idCol: String,
                   maxIters: Int = 50): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    var dist = sources.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    var frontier = dist
    var it = 0
    var done = frontier.isEmpty
    while (!done && it < maxIters) {
      // eager checkpoints: the frees below must only run after the
      // depending frame has fully materialized (a lazy checkpoint
      // materialized by isEmpty computes one partition, then reads of
      // the rest would hit freed parent blocks)
      val next = frontier
        .join(sym, frontier("id") === sym("u"))
        .select(col("v").as("id"), (col("dist") + 1).as("dist"))
        .groupBy("id").agg(min("dist").as("dist"))
        .join(dist.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint(true)
      done = next.isEmpty
      if (!done) {
        val merged = dist.unionByName(next).localCheckpoint(true)
        graft.plans.Blocks.free(dist)
        if (it > 0) graft.plans.Blocks.free(frontier)
        dist = merged
        frontier = next
      } else if (it > 0) graft.plans.Blocks.free(frontier)
      it += 1
    }
    dist
  }

  /** Degree histogram with CCDF and the discrete power-law MLE — the
    * "is this graph scale-free, and how heavy is the tail?" summary
    * (α ≈ 2–3 for web/citation graphs; a light tail breaks the
    * hub-pruning assumptions samplers make). Per distinct degree d ≥
    * dMin: node count, cum_ge = #nodes with degree ≥ d (the CCDF
    * numerator), and the Clauset–Shalizi–Newman discrete estimator
    *   α̂ = 1 + n / Σᵢ ln(dᵢ / (dMin − ½))
    * as a constant column (one fixed-order float over an exact
    * Σ-of-logs aggregate; each log is the same IEEE value per distinct
    * degree — summed via ROUND-TO-MICROS integers so partial-agg
    * order cannot wiggle low bits).
    *
    * Degrees: one aggregate over the symmetrized edge list; histogram
    * and CCDF windows run over DISTINCT degrees (domain-bounded, not
    * node-bounded). Output: (degree, n_nodes, cum_ge, alpha_micro). */
  def degreeDistribution(edges: DataFrame, srcCol: String, dstCol: String,
                         dMin: Long = 1L): DataFrame = {
    require(dMin >= 1, s"dMin must be >= 1, got $dMin")
    val ends = edges.select(col(srcCol).cast("long").as("id"))
      .unionByName(edges.select(col(dstCol).cast("long").as("id")))
    val deg = ends.groupBy("id").agg(count(lit(1)).as("degree"))
    val hist = deg.where(col("degree") >= dMin)
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
    // per-distinct-degree log term, micro-quantized BEFORE the sum so
    // the fold is exact integer addition (order-free)
    val logTermMicro = round(
      log(col("degree").cast("double") / lit(dMin - 0.5)) * 1e6)
      .cast("long")
    val mle = hist.agg(sum("n_nodes").as("n"),
      sum(logTermMicro * col("n_nodes")).as("slog_micro"))
    val wGe = Window.orderBy(col("degree").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum_ge", sum("n_nodes").over(wGe))
      .crossJoin(broadcast(mle))
      .select(col("degree"), col("n_nodes"), col("cum_ge"),
        round(lit(1e6) + col("n").cast("double") * 1e12
          / col("slog_micro").cast("double")).cast("long").as("alpha_micro"))
  }

  /** HITS hub/authority scores (Kleinberg 1999, "Authoritative sources
    * in a hyperlinked environment") in EXACT path-count form: with the
    * all-ones start vector and NO per-round normalization, each
    * alternating update
    *   hub(u) = Σ_{u→v} auth(v),   auth(v) = Σ_{u→v} hub(u)
    * keeps every score an integer count of bounded-length alternating
    * walks — the [[pagerankInt]] replay discipline with no micro-units
    * needed at all. Normalization only rescales within a round, so
    * rankings (top hubs / top authorities — the curation signal) are
    * identical to the classical iteration's.
    *
    * Scale shape: each half-round is one dst- (or src-) keyed
    * edges ⋈ scores join plus a keyed aggregate with map-side
    * combine — the iterative-join skeleton of pagerankInt. Magnitudes
    * grow like (d_avg²)^rounds; ANSI mode throws on Long overflow
    * rather than corrupting, so callers keep `rounds` small (2-3) on
    * dense graphs. Edge multiplicity acts as weight — callers wanting
    * the classical 0/1 adjacency pass distinct edges.
    *
    * Output: (node, hub, auth) over every node in the edge set. */
  def hitsCounts(edges: DataFrame, srcCol: String, dstCol: String,
                 rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(lvl)
    // auth_0 = 1 everywhere → hub_1 = outdeg; subsequent rounds join.
    // ONE checkpoint per full round, on the hub half only
    // (pagerankIntRounds rationale — uncut, the lineage and exchange
    // count grow quadratically in rounds): the auth half stays LAZY,
    // so its single join+agg over the checkpointed hub fuses into the
    // next round's checkpoint job. Superseded hub checkpoints are
    // freed as soon as the next lands; job count is rounds+1, not
    // 2·rounds+1.
    var prevCp: Option[DataFrame] = None
    def cp(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true)
      prevCp.foreach(graft.plans.Blocks.free)
      prevCp = Some(c)
      c
    }
    def authOf(hub: DataFrame): DataFrame =
      e.join(hub, e("src") === hub("node"))
        .groupBy("dst").agg(sum("hub").as("auth"))
        .select(col("dst").as("node"), col("auth"))
    var hub = cp(e.groupBy("src").agg(count(lit(1)).as("hub"))
      .select(col("src").as("node"), col("hub")))
    var auth = authOf(hub)
    for (_ <- 2 to rounds) {
      hub = cp(e.join(auth, e("dst") === auth("node"))
        .groupBy("src").agg(sum("auth").as("hub"))
        .select(col("src").as("node"), col("hub")))
      auth = authOf(hub)
    }
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val out = nodes
      .join(hub, Seq("node"), "left").join(auth, Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
    // e stays persisted — the returned frame still reads it (nodes +
    // the lazy final auth); the caller's query boundary frees it along
    // with the final hub checkpoint (graft.plans.Blocks.releaseAll)
    out
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003, "Friends and
    * neighbors on the Web") over a bipartite edge set: for left-side
    * pairs (a, b) sharing right-side neighbors z,
    *   score(a, b) = Σ_z 1 / ln(deg(z))
    * — common neighbors discounted by their promiscuity. The missing-
    * edge recommender over co-engagement graphs (and the link-based
    * near-dup signal over doc→entity graphs).
    *
    * Exact-replay discipline: each z contributes round(1e6/ln deg z)
    * micros — quantized PER NEIGHBOR before the order-free integer
    * sum (q219's per-term log pattern). Hot right-side nodes with
    * deg > maxDeg are DROPPED, not truncated (the df-cap semantic of
    * [[Dedup.cappedShinglePairs]]): a z shared by everyone carries
    * ~zero signal and would alone generate O(deg²) pairs. Pair
    * generation is in-row over the sorted per-z neighbor list
    * (posexplode + slice — q168's shape: no self-join, one exchange).
    *
    * Output: (a, b, common, aa_micro) for pairs with ≥ minCommon
    * shared neighbors; a < b. */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDeg: Int = 64, minCommon: Int = 2): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2, got $maxDeg")
    val e = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("z")).distinct()
    val byZ = e.groupBy("z").agg(sort_array(collect_list("a")).as("ns"))
      .where(size(col("ns")).between(2, maxDeg))
      .withColumn("term_micro",
        round(lit(1e6) / log(size(col("ns")).cast("double"))).cast("long"))
    val pairs = byZ
      .select(col("term_micro"), posexplode(col("ns")).as(Seq("i", "a")),
        col("ns"))
      .select(col("term_micro"), col("a"),
        explode(slice(col("ns"), col("i") + lit(2),
          greatest(size(col("ns")) - col("i") - lit(1), lit(0))))
          .as("b"))
    pairs.groupBy("a", "b")
      .agg(count(lit(1)).as("common"), sum("term_micro").as("aa_micro"))
      .where(col("common") >= minCommon)
  }
}
