package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Stats

/** Streaming data-quality monitors over a live ingest: statistical
  * screens that compare what is ARRIVING against a fixed reference,
  * trigger by trigger. The state posture is the MinhashStore one —
  * the accumulated live histogram lives in a parquet store DIRECTORY,
  * not in memory, so the monitor is restart-safe under the stream's
  * checkpoint contract and a second consumer (dashboard, alerting
  * batch job) can read the same store.
  */
object StreamMonitor {

  /** Per-trigger KS drift of the live stream vs a fixed reference.
    *
    * Each micro-batch OVERWRITES its own shard `storeDir/b<batchId>`
    * with its (stratum, v) counts. foreachBatch is at-least-once, and
    * a batchId-keyed overwrite is what makes the replay harmless: the
    * re-run rewrites the same shard with the same counts instead of
    * appending a second copy (which would permanently inflate the
    * accumulated histogram and every later d_micro). That — plus the
    * crash-safe compaction below — is the restart-safety contract.
    *
    * Every `compactEvery` batches the backlog is folded into one
    * compacted shard IN the stream (see [[compactShards]]), so a
    * week-long monitor re-aggregates a bounded shard set each trigger
    * instead of linearly slowing with stream lifetime. 0 disables.
    *
    * Scale shape: the per-batch write shuffles only the BATCH's
    * counts; the store re-aggregation is (stratum, v)-keyed over
    * histogram-scale rows (distinct values, not events) across a
    * compaction-bounded shard count; the reference histogram is
    * computed once up front.
    *
    * `ref` is raw reference rows (`refStratumCol`, `refValueCol` —
    * integer-valued). `live` is the streaming frame with `stratumCol`,
    * `valueCol`. Sink receives (drift frame, batchId). */
  def ksDriftStream(live: DataFrame, stratumCol: String, valueCol: String,
                    ref: DataFrame, refStratumCol: String, refValueCol: String,
                    storeDir: String, checkpointDir: String,
                    compactEvery: Int = 32)
                   (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = live.sparkSession
    // reference histogram, computed once — histogram-scale, reused
    // every trigger
    val refCounts = ref
      .groupBy(col(refStratumCol).as("stratum"),
        col(refValueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("ca"))
      .localCheckpoint(true)
    live
      .select(col(stratumCol).as("stratum"), col(valueCol).cast("long").as("v"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy("stratum", "v").agg(count(lit(1)).as("cb"))
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactShards(spark, storeDir, s"c$batchId")
        sink(ksAgainstStore(spark, refCounts, storeDir), batchId)
      }
      .start()
  }

  /** Fold every live shard into one compacted shard `storeDir/<name>`
    * (cell-wise count addition — exact, order-free), then delete the
    * sources. Crash-safe under foreachBatch replay via a sources
    * marker written INSIDE the target after its data:
    *
    *  - die before the marker → sources are untouched (deletes only
    *    start after the marker lands); the replay recomputes the
    *    target from them — overwrite clears any half-written data;
    *  - die mid-delete → the marker survives (it is removed last), so
    *    the replay skips recompute and only finishes the listed
    *    deletes — the target already holds every source's counts;
    *  - die after the deletes → replay sees no marker and no sources
    *    (the target is excluded from its own inputs) and no-ops.
    *
    * Single-writer discipline (one stream owns a store) is assumed,
    * same as every store in the family.
    *
    * `reduce` post-processes the cell-wise sum before it lands (state
    * families whose compaction is MORE than addition — the
    * Misra–Gries summary reduction in [[misraGriesStream]]); the
    * default is identity (pure additive cells). Crash-safety is
    * unchanged: the reduction happens inside the recompute branch, so
    * a replay reapplies it from the untouched sources. */
  def compactShards(spark: SparkSession, storeDir: String,
                    targetName: String,
                    reduce: DataFrame => DataFrame = identity): Unit = {
    val base = new Path(storeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(base, targetName)
    val marker = new Path(target, "_compacted_sources")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val listed = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      listed.foreach(d => fs.delete(new Path(base, d), true))
      fs.delete(marker, false)
    } else {
      val sources = fs.listStatus(base).toSeq
        .filter(s => s.isDirectory && s.getPath.getName != targetName)
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
      if (sources.nonEmpty) {
        reduce(spark.read.parquet(sources.map(n => s"$storeDir/$n"): _*)
            .groupBy("stratum", "v").agg(sum("cb").as("cb")))
          .coalesce(1)
          .write.mode("overwrite").parquet(target.toString)
        val out = fs.create(marker, true)
        try out.write(sources.mkString("\n").getBytes("UTF-8"))
        finally out.close()
        sources.foreach(d => fs.delete(new Path(base, d), true))
        fs.delete(marker, false)
      }
    }
  }

  /** The accumulated live histogram across every shard in the store
    * (cell-wise sum). Reads the per-batch shard layout; a flat legacy
    * store (parquet files directly under `storeDir`) still reads. */
  def readStore(spark: SparkSession, storeDir: String): DataFrame = {
    val base = new Path(storeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
    val raw = if (dirs.isEmpty) spark.read.parquet(storeDir)
              else spark.read.parquet(dirs: _*)
    raw.groupBy("stratum", "v").agg(sum("cb").as("cb"))
  }

  /** The drift frame a monitor emits: reference counts (A side) full-
    * outer-joined with the accumulated store (B side), missing sides
    * zero-filled, through [[Stats.ksFromCounts]]. Also the offline
    * entry point — point it at any monitor's store directory. */
  def ksAgainstStore(spark: SparkSession, refCounts: DataFrame,
                     storeDir: String): DataFrame = {
    val liveCounts = readStore(spark, storeDir)
    val joined = refCounts.join(liveCounts, Seq("stratum", "v"), "full_outer")
      .select(col("stratum"), col("v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    Stats.ksFromCounts(joined)
  }

  /** Streaming heavy hitters: exact running counts per key with the
    * top-k emitted every trigger — the live twin of
    * [[graft.operators.KeyChecks.keySkew]] (hot-partition / abuse-key
    * watch over an ingest).
    *
    * Counts are EXACT, not sketched, because the state lives in the
    * same parquet shard store as [[ksDriftStream]] (key rides the
    * store's `stratum` column, `v` pinned to 0): per-batch counts
    * overwrite a batchId shard (idempotent under foreachBatch
    * replay), `compactEvery` folds the backlog so a long-lived stream
    * re-aggregates a bounded shard set, and the store stays readable
    * offline. Per-trigger shuffle is the BATCH's distinct keys; the
    * emit is a key-scale aggregate + bounded TakeOrdered(k). */
  def heavyHittersStream(live: DataFrame, keyCol: String, k: Int,
                         storeDir: String, checkpointDir: String,
                         compactEvery: Int = 32)
                        (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(k >= 1, "k must be >= 1")
    val spark = live.sparkSession
    live
      .select(col(keyCol).cast("string").as("stratum"), lit(0L).as("v"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy("stratum", "v").agg(count(lit(1)).as("cb"))
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactShards(spark, storeDir, s"c$batchId")
        sink(topKFromStore(spark, storeDir, k), batchId)
      }
      .start()
  }

  /** Top-k keys by accumulated count from a heavy-hitters store —
    * also the offline entry point. (key ASC tie-break: deterministic
    * emits.) */
  def topKFromStore(spark: SparkSession, storeDir: String, k: Int): DataFrame =
    readStore(spark, storeDir)
      .select(col("stratum").as("key"), col("cb").cast("long").as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(k)

  /** Streaming Misra–Gries heavy TERMS — the live twin of
    * [[graft.operators.TextAnalytics.heavyHitters]] with the state
    * posture inverted to fit an unbounded stream: the batch operator
    * keeps only candidate KEYS and rescans for exact counts; a stream
    * cannot rescan, so this keeps the candidates' retained WEIGHTS,
    * which are mergeable by plain cell-wise addition with the additive
    * error guarantee preserved — for every term,
    *   c(t) − N/(k+1) ≤ ĉ(t) ≤ c(t)
    * over the whole stream so far (Misra & Gries 1982; mergeability:
    * Agarwal et al., "Mergeable summaries", TODS 2013). Any term with
    * true frequency > N/(k+1) is guaranteed present.
    *
    * State rides the same parquet shard store as [[ksDriftStream]]
    * (idempotent batchId-shard overwrite, crash-safe compaction):
    * counter cells as (stratum = term, v = 0, cb = retained weight)
    * plus one token-total cell (v = 1) per shard — both additive, so
    * readback is a plain cell-wise sum. Compaction additionally
    * applies the MG summary REDUCTION (subtract the (k+1)-th largest
    * counter from all, drop non-positive — the TODS 2013 merge step),
    * so the compacted store holds ≤ k counters regardless of stream
    * lifetime; between compactions the store is bounded by
    * shards·partitions·k, never vocabulary-scale.
    *
    * Sink receives ([[heavyTermsFromStore]] frame, batchId):
    * (term, n_min, n_max) — true count bracketed by the summary
    * weight and weight + ⌊N/(k+1)⌋ — top `topN` by n_min. */
  def misraGriesStream(live: DataFrame, textCol: String, k: Int,
                       topN: Int, storeDir: String, checkpointDir: String,
                       compactEvery: Int = 32)
                      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(k >= 1 && topN >= 1, "k and topN must be >= 1")
    val spark = live.sparkSession
    live
      .select(col(textCol).cast("string").as("text"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import spark.implicits._
        val toks = batch.select(explode(
          graft.functions.Text.tokens(lower(col("text")))).as("term"))
          .persist()
        val nTok = toks.count()
        val counters = graft.operators.TextAnalytics.mgSummaries(toks, k)
          .groupBy("term").agg(sum("w").as("cb"))
          .select(col("term").as("stratum"), lit(0L).as("v"), col("cb"))
        counters
          .unionByName(Seq(("__total__", 1L, nTok))
            .toDF("stratum", "v", "cb"))
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        toks.unpersist(false)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactShards(spark, storeDir, s"c$batchId", mgReduce(k))
        sink(heavyTermsFromStore(spark, storeDir, k, topN), batchId)
      }
      .start()
  }

  /** The MG summary reduction for [[compactShards]]: keep the total
    * cell, subtract the (k+1)-th largest counter weight from every
    * counter, drop non-positive — at most k counters survive and the
    * store-wide error bound N/(k+1) is preserved (Agarwal et al.,
    * TODS 2013, Lemma 1 applied to the summed summary). */
  private def mgReduce(k: Int)(cells: DataFrame): DataFrame = {
    // one bounded TakeOrdered probe (k+1 longs driver-side) decides
    // both "any reduction needed?" and the threshold — no caching, so
    // nothing outlives the compaction that calls this
    val top = cells.where(col("v") === 0L)
      .orderBy(col("cb").desc).limit(k + 1).select("cb").collect()
    if (top.length <= k) cells
    else {
      val th = top.map(_.getLong(0)).min
      cells.where(col("v") === 0L)
        .select(col("stratum"), col("v"), (col("cb") - lit(th)).as("cb"))
        .where(col("cb") > 0L)
        .unionByName(cells.where(col("v") === 1L))
    }
  }

  /** Accumulated heavy terms from a Misra–Gries store — also the
    * offline entry point. (term, n_min, n_max): the true stream count
    * of `term` lies in [n_min, n_max]; top `topN` by n_min, term ASC
    * tie-break. */
  def heavyTermsFromStore(spark: SparkSession, storeDir: String,
                          k: Int, topN: Int): DataFrame = {
    // two store reads, zero retained state per trigger (a cached
    // frame here would leak blocks across a long stream's triggers)
    val total = readStore(spark, storeDir).where(col("v") === 1L)
      .agg(coalesce(sum("cb"), lit(0L))).head().getLong(0)
    val slack = total / (k + 1L)
    readStore(spark, storeDir).where(col("v") === 0L)
      .select(col("stratum").as("term"), col("cb").as("n_min"),
        (col("cb") + lit(slack)).as("n_max"))
      .orderBy(col("n_min").desc, col("term").asc)
      .limit(topN)
  }

  /** Streaming peak-concurrency monitor: the live twin of
    * [[graft.operators.TimeSeries.maxConcurrent]] — "what is the
    * all-time peak of simultaneous sessions per key, as of now?"
    * emitted every trigger over half-open [start, end) intervals.
    *
    * State is the same parquet shard store as [[ksDriftStream]], with
    * the sweep-line's per-timestamp NET deltas riding the store's
    * cells: `stratum` = key, `v` = epoch micros, `cb` = Σ(+1 starts,
    * −1 ends) at that instant. Net deltas are CLOSED under the
    * store's cell-wise addition — a batch's contribution to an
    * instant simply adds — so idempotent batchId-shard overwrite,
    * compaction, and offline readback all work unchanged. Late or
    * out-of-order intervals are folded exactly (the peak is
    * recomputed from the full accumulated delta field, not
    * incrementally), trading per-trigger cost — bounded by distinct
    * (key, instant) cells across a compaction-bounded shard set — for
    * exactness under any arrival order. */
  def concurrencyStream(live: DataFrame, keyCol: String, startCol: String,
                        endCol: String, storeDir: String,
                        checkpointDir: String, compactEvery: Int = 32)
                       (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = live.sparkSession
    live
      .select(col(keyCol).cast("string").as("stratum"),
        unix_micros(col(startCol)).as("s"), unix_micros(col(endCol)).as("e"))
      .where(col("s").isNotNull && col("e").isNotNull && col("s") <= col("e"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(col("stratum"), col("s").as("v"), lit(1L).as("dl"))
          .unionByName(batch.select(col("stratum"), col("e").as("v"),
            lit(-1L).as("dl")))
          .groupBy("stratum", "v").agg(sum("dl").as("cb"))
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactShards(spark, storeDir, s"c$batchId")
        sink(peakFromStore(spark, storeDir), batchId)
      }
      .start()
  }

  /** Streaming histogram ingest — the live feed for the
    * [[graft.operators.HistStore]] read family: per-key value
    * DISTRIBUTION accumulated over an unbounded stream, answering
    * exact binned quantiles and planner selectivity estimates AS OF
    * NOW. Bin counts are linear, so the clamp-binned cells ride the
    * shard store unchanged (`stratum` = key, `v` = bin, `cb` = count
    * — idempotent batchId overwrite, crash-safe compaction); every
    * trigger the accumulated cells adapt straight into
    * [[graft.operators.HistStore.quantilesFromCells]] /
    * [[graft.operators.HistStore.estimateFromCells]]. The sink
    * receives the merged (key, bin, n) frame + batchId; compose the
    * read you need. */
  def histStream(live: DataFrame, keyCol: String, valueCol: String,
                 lo: Long, width: Long, bins: Int,
                 storeDir: String, checkpointDir: String,
                 compactEvery: Int = 32)
                (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(width > 0 && bins > 0, "need positive bin width and count")
    val spark = live.sparkSession
    live
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.HistStore.shard(batch, keyCol, valueCol,
            lo, width, bins)
          .select(col("key").as("stratum"), col("bin").as("v"),
            col("n").as("cb"))
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactShards(spark, storeDir, s"c$batchId")
        sink(histCells(spark, storeDir), batchId)
      }
      .start()
  }

  /** Accumulated (key, bin, n) cells from a histogram store — the
    * adapter into the HistStore read family; also the offline entry
    * point. */
  def histCells(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir)
      .select(col("stratum").as("key"), col("v").as("bin"),
        col("cb").as("n"))

  /** Streaming expectation-suite monitor — the live twin of
    * [[graft.operators.KeyChecks.ruleAudit]]: per-rule violation
    * counts and rates accumulated over an unbounded ingest, one
    * conditional-sum scan per micro-batch (all rules in one pass,
    * exactly the batch operator's cost model). Counts ride the shard
    * store as (stratum = rule, v ∈ {0 = violations, 1 = total}) —
    * additive cells, so idempotent overwrite / compaction / offline
    * readback are unchanged. Sink receives the accumulated audit
    * frame (rule, n, n_violations, rate_micro) + batchId. */
  def ruleAuditStream(live: DataFrame,
                      rules: Seq[(String, org.apache.spark.sql.Column)],
                      storeDir: String, checkpointDir: String,
                      compactEvery: Int = 32)
                     (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(rules.nonEmpty, "need at least one rule")
    val spark = live.sparkSession
    live
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // coalesce: sum over an empty micro-batch (recovery replay,
        // no-data trigger) is NULL — getLong would NPE and kill the query.
        val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
          case ((_, pred), i) =>
            coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
              lit(0L)).as(s"__v$i")
        }
        val row = batch.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(0)
        import spark.implicits._
        rules.zipWithIndex.flatMap { case ((name, _), i) =>
          Seq((name, 0L, row.getLong(i + 1)), (name, 1L, n))
        }.toDF("stratum", "v", "cb")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactShards(spark, storeDir, s"c$batchId")
        sink(auditFromStore(spark, storeDir), batchId)
      }
      .start()
  }

  /** Accumulated audit frame from a rule-audit store — also the
    * offline entry point. */
  def auditFromStore(spark: SparkSession, storeDir: String): DataFrame =
    readStore(spark, storeDir)
      .groupBy(col("stratum").as("rule"))
      .agg(sum(when(col("v") === 1L, col("cb")).otherwise(0L)).as("n"),
        sum(when(col("v") === 0L, col("cb")).otherwise(0L))
          .as("n_violations"))
      .withColumn("rate_micro",
        when(col("n") > 0, expr("(n_violations * 1000000L) div n"))
          .otherwise(0L))

  /** All-time peak concurrency per key from a concurrency store —
    * also the offline entry point. Zero-net instants (an interval
    * fully contained in one batch's same-instant churn, or a
    * compacted cancellation) drop before the sweep: they cannot move
    * any prefix. */
  def peakFromStore(spark: SparkSession, storeDir: String): DataFrame =
    graft.operators.TimeSeries.peakOverDeltas(
      readStore(spark, storeDir)
        .where(col("cb") =!= 0L)
        .select(col("stratum").as("key"), col("v").as("t"),
          col("cb").as("net")))
}
