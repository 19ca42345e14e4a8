package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental connected-components store — the IDENTITY
  * member of the mergeable-store family (HLL = distinct, CMS =
  * frequency, Hist = distribution, Minhash = near-dup fingerprints):
  * entity-resolution clusters maintained across edge-batch arrivals
  * (new linkage pairs, new duplicate evidence) without recomputing
  * components over the full edge history.
  *
  * The store keeps a spanning-FOREST snapshot, not the edge log: a
  * component's (id → rep) star rows are connectivity-equivalent to
  * every edge that produced it, so folding a new batch runs the star
  * algorithm over |V| forest rows + |batch| new edges — the full edge
  * history (potentially edges ≫ V: every pair of a hot entity) is
  * never replayed. This is the classic union-find-as-dataframe shape
  * and the reason the store survives 100 TB of accumulated evidence.
  *
  * Layout under `path`:
  *  - `forest/`  — (id, rep) star snapshot (one shard after write/
  *    compact; appends do NOT touch it).
  *  - `pending/` — raw (id_a, id_b) edge shards appended since the
  *    last fold; append is a batch-scale write, no global work.
  *
  * [[components]] answers from forest ∪ pending (one star-algorithm
  * run over forest rows + pending backlog — exact at every point);
  * [[compactStore]] folds pending into a fresh one-shard forest so
  * reads stop paying the backlog. Same read-your-writes contract as
  * [[MinhashStore]]: appends are visible immediately, compaction is a
  * maintenance-window rewrite.
  */
object CcStore {

  private def hasDir(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Build the store from an initial edge set (overwrites `path`). */
  def write(edges: DataFrame, path: String): Unit = {
    val spark = edges.sparkSession
    val labels = Dedup.canonicalizeCc(
      edges.select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b")))
    labels.write.mode("overwrite").parquet(s"$path/forest")
    graft.plans.Blocks.free(labels)
    val fs = new org.apache.hadoop.fs.Path(s"$path/pending")
    fs.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(fs, true)
  }

  /** Append an edge batch: a batch-scale parquet write, no global
    * recompute — the fold happens lazily at [[components]] /
    * [[compactStore]]. Self-loops are dropped; the batch may mention
    * ids the store has never seen (new singletons-with-evidence). */
  def append(edges: DataFrame, path: String): Unit =
    edges.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .write.mode("append").parquet(s"$path/pending")

  /** Current exact components: (id, rep = component min), one row per
    * id that has ever appeared in an edge. Cost: one star-algorithm
    * run over |V| forest rows + the pending backlog — independent of
    * the historical edge count. */
  def components(spark: SparkSession, path: String): DataFrame = {
    val forest = spark.read.parquet(s"$path/forest")
      .select(col("id").as("id_a"), col("rep").as("id_b"))
    val all =
      if (hasDir(spark, s"$path/pending"))
        forest.unionByName(spark.read.parquet(s"$path/pending"))
      else forest
    // star rows include rep self-rows only implicitly (rep appears as
    // id_b); canonicalizeCc emits every endpoint, so reps re-surface.
    // Roots of singleton-free components are fine; ids that were only
    // ever self-looped never entered the store by contract.
    Dedup.canonicalizeCc(all.where(col("id_a") =!= col("id_b")))
  }

  /** Streaming edge ingest — the stream twin of [[append]]: each
    * micro-batch's (id_a, id_b) pairs land in the pending log, and
    * every `compactEvery` batches the backlog folds into the forest
    * so [[components]] reads stay bounded by |V| + recent backlog
    * (the CmsStore in-stream-compaction pattern). The store must be
    * [[write]]-initialized (possibly from an empty edge frame).
    *
    * Failure semantics: foreachBatch is at-least-once, and a replayed
    * batch re-appends its edges — which is HARMLESS here: connected
    * components are idempotent under edge duplication (the star
    * algorithm distincts its input), so no batchId bookkeeping is
    * needed for correctness; duplicates cost pending bytes until the
    * next compaction reclaims them. */
  def ingestStream(edges: DataFrame, path: String, checkpoint: String,
                   compactEvery: Int = 10)
      : org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        append(batch, path)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0)
          compactStore(batch.sparkSession, path)
        ()
      }
      .start()

  /** Fold the pending backlog into a fresh one-shard forest snapshot
    * and clear it. Returns a manifest (component, rows). */
  def compactStore(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val folded = components(spark, path)
    val tmp = s"$path/_compact_tmp"
    fs.delete(new Path(tmp), true)
    folded.coalesce(1).write.parquet(s"$tmp/forest")
    graft.plans.Blocks.free(folded)
    fs.delete(new Path(s"$path/forest"), true)
    fs.rename(new Path(s"$tmp/forest"), new Path(s"$path/forest"))
    fs.delete(new Path(tmp), true)
    fs.delete(new Path(s"$path/pending"), true)
    import spark.implicits._
    Seq(("forest", spark.read.parquet(s"$path/forest").count()),
        ("pending", 0L))
      .toDF("component", "rows")
  }
}
