package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted EMBEDDING store — [[MinhashStore]]'s twin at the semantic
  * layer: fingerprint the corpus once as a cell-partitioned IVF index
  * ([[Knn.writeIvfIndex]]'s layout), then near-dedup every arriving
  * batch against the full history with a partition-pruned probe —
  * incremental SemDeDup as a running service. Surface-text dedup
  * misses paraphrases and translations; this catches anything whose
  * EMBEDDING collides, at the cost of IVF's nprobe recall (a dup
  * landing in an unprobed cell escapes — raise nprobe or run the
  * MinhashStore twin alongside for the exact-surface tier).
  *
  * Layout under `path` (exactly [[Knn.writeIvfIndex]]):
  *   - `centroids/` metadata-scale cell centers
  *   - `cells/`     (id, vec) partitioned by cell — probes read only
  *                  the probed cells' directories.
  *
  * Centroid drift under distribution shift is handled by a periodic
  * full rebuild ([[write]] on the accumulated corpus) — the standard
  * IVF maintenance trade, same note as [[Knn.appendIvfIndex]].
  */
object EmbeddingStore {

  /** Build the store from an initial corpus (overwrites `path`). */
  def write(df: DataFrame, idCol: String, vecCol: String, path: String,
            c: Int = 16, refineIters: Int = 0,
            portableHash: Boolean = false): Unit =
    Knn.writeIvfIndex(df, idCol, vecCol, path, c, refineIters, portableHash)

  /** Append fingerprints without probing (bulk backfill). */
  def append(batch: DataFrame, idCol: String, vecCol: String,
             path: String): Unit =
    Knn.appendIvfIndex(batch, idCol, vecCol, path)

  /** Semantic near-dup hits between batch docs and store docs:
    * (id_new, id_store, sim >= tau). k=1 suffices for detection — the
    * TOP neighbor beats every other, so "best >= tau" is exactly
    * "any >= tau". The probe reads ~nprobe/c of the store
    * (partition-pruned; plan-asserted in Knn's specs). */
  def probe(spark: SparkSession, path: String,
            batch: DataFrame, idCol: String, vecCol: String,
            tau: Double = 0.95, nprobe: Int = 4): DataFrame =
    Knn.searchIvf(spark, path, batch, idCol, vecCol, k = 1, nprobe)
      .where(col("sim") >= tau)
      .select(col("query_id").as("id_new"),
        col("neighbor_id").as("id_store"), col("sim"))

  /** One-call incremental ingest: drop batch docs with a semantic
    * near-dup in the history (or a smaller-id near-dup within the
    * batch itself — brute-force within the increment-scale batch by
    * default; pass planes/dim for LSH-bucketed within-batch pairs on
    * big backfills), append the survivors' vectors, return the
    * surviving rows. `survivorSink` runs BEFORE the append —
    * [[MinhashStore.ingest]]'s retry-safety ordering: a crash between
    * the writes re-emits rows (dedupable by id) instead of silently
    * dropping a batch whose fingerprints landed first. */
  def ingest(batch: DataFrame, idCol: String, vecCol: String, path: String,
             tau: Double = 0.95, nprobe: Int = 4,
             planes: Int = 0, dim: Int = 0, seed: Long = 7L,
             survivorSink: Option[DataFrame => Unit] = None): DataFrame = {
    val spark = batch.sparkSession
    val hits = probe(spark, path, batch, idCol, vecCol, tau, nprobe)
    val pairsWithin = Dedup.embeddingPairs(batch, idCol, vecCol, tau,
      planes = planes, dim = dim, seed = seed)
    val survivors = batch
      .join(hits.select(col("id_new").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .join(pairsWithin.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    survivors.count()
    survivorSink.foreach(_(survivors))
    append(survivors, idCol, vecCol, path)
    survivors
  }

  /** Streaming semantic dedup: every micro-batch probed against the
    * store, survivors land in `outDir` and their vectors in the store
    * — the store directory as restart-safe cross-batch state (the
    * unbounded, queryable-at-rest complement of
    * StreamDedup.nearDedupStreamEmbedding's watermark-bounded state
    * store). Survivor-first write order as in [[ingest]]. */
  def ingestStream(stream: DataFrame, idCol: String, vecCol: String,
                   path: String, outDir: String, checkpoint: String,
                   tau: Double = 0.95, nprobe: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val survivors = ingest(batch, idCol, vecCol, path, tau, nprobe,
          survivorSink = Some(df => df.write.mode("append").parquet(outDir)))
        survivors.unpersist(false)
        ()
      }
      .start()
}
