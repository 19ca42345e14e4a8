package graft.streaming

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
    * Each micro-batch appends its (stratum, v) counts to `storeDir`
    * (append-only parquet — blind writes, no read-modify-write race),
    * re-aggregates the store into the accumulated live histogram, and
    * hands `sink` the per-stratum [[Stats.ksFromCounts]] drift frame
    * (stratum, n_a, n_b, d_micro) with the reference on the A side —
    * plus the batch id for checkpoint-aware idempotence.
    *
    * Scale shape: the per-batch append shuffles only the BATCH's
    * counts; the store re-aggregation is (stratum, v)-keyed over
    * histogram-scale rows (distinct values, not events); the
    * reference histogram is computed once up front. Compaction of a
    * long-lived store rides the same pattern as CmsStore.compactStore
    * (re-aggregate + rewrite offline).
    *
    * `ref` is raw reference rows (`refStratumCol`, `refValueCol` —
    * integer-valued). `live` is the streaming frame with `stratumCol`,
    * `valueCol`. */
  def ksDriftStream(live: DataFrame, stratumCol: String, valueCol: String,
                    ref: DataFrame, refStratumCol: String, refValueCol: String,
                    storeDir: String, checkpointDir: String)
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
          .write.mode("append").parquet(storeDir)
        sink(ksAgainstStore(spark, refCounts, storeDir), batchId)
      }
      .start()
  }

  /** The drift frame a monitor emits: reference counts (A side) full-
    * outer-joined with the accumulated store (B side), missing sides
    * zero-filled, through [[Stats.ksFromCounts]]. Also the offline
    * entry point — point it at any monitor's store directory. */
  def ksAgainstStore(spark: SparkSession, refCounts: DataFrame,
                     storeDir: String): DataFrame = {
    val liveCounts = spark.read.parquet(storeDir)
      .groupBy("stratum", "v").agg(sum("cb").as("cb"))
    val joined = refCounts.join(liveCounts, Seq("stratum", "v"), "full_outer")
      .select(col("stratum"), col("v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    Stats.ksFromCounts(joined)
  }
}
