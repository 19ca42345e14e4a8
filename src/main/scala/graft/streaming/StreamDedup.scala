package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.{Hashes, Text}

/** Continuous exact-dedup for a document stream: fingerprint each
  * arriving document (normalized-text md5 — same key as the batch
  * `Dedup.exact`) and keep the first occurrence within the watermark
  * horizon. State is one fingerprint per doc bounded by the watermark,
  * so the state store cannot grow without limit.
  *
  * Streaming twin of the batch exact-dedup pass; the same composition
  * with `Hashes.simhash64` gives continuous near-dup suppression at a
  * chosen hamming granularity.
  */
object StreamDedup {

  /** `docs` must be a streaming DataFrame with (idCol, textCol,
    * tsCol). Emits first-seen documents only. */
  def exactDedupStream(docs: DataFrame, idCol: String, textCol: String,
                       tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", Text.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Continuous near-dup suppression at sketch granularity: documents
    * whose 64-bit simhash collides with one already seen inside the
    * watermark horizon are dropped. Collision = identical sketch
    * (hamming 0) — near-identical texts that normalize to the same
    * majority bits; for hamming ≤ d suppression run the batch
    * `Dedup.simhashPairs` over a window instead (a per-block
    * dropDuplicates would over-drop: sharing ONE block is not
    * near-duplication). State: one 8-byte key per distinct sketch in
    * the horizon. */
  def nearDedupStream(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp",
        graft.functions.Hashes.simhash64(
          Text.tokens(Text.normalizeText(col(textCol)))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  case class BandHit(doc_id: Long, ts: Timestamp, text: String,
                     band: Int, bucket: Long, sig: Array[Long])
  case class BandVerdict(doc_id: Long, ts: Timestamp, text: String, dup: Boolean)
  case class DocVerdict(doc_id: Long, ts: Timestamp, text: String, is_dup: Boolean)

  /** Continuous MinHash-LSH near-dup detection — the streaming twin of
    * `Dedup.minhashLshPairs` at full LSH granularity (nearDedupStream
    * above only catches hamming-0 simhash collisions). Two chained
    * stateful stages, both in the RocksDB-backed transformWithState
    * API:
    *
    *   1. keyed by (band, bucket): the FIRST signature to claim a
    *      bucket inside the watermark horizon is held in a ValueState;
    *      later arrivals in the same bucket verify signature overlap
    *      against the holder (>= tau → that band votes duplicate).
    *      An event-time timer evicts the holder once the horizon
    *      passes — state is bounded by distinct buckets per horizon,
    *      keys-only scale (the 100 TB posture of the batch path).
    *   2. keyed by doc id: the `bands` per-doc votes (which arrive in
    *      one micro-batch — they are one exploded input row) combine
    *      into a single verdict: is_dup = any band voted duplicate.
    *
    * Emits EVERY document with its verdict (filter `!is_dup` for the
    * kept stream). Within a batch, earlier (ts, doc_id) claims a
    * bucket first — same-batch duplicates resolve deterministically. */
  def nearDedupStreamMinhash(docs: DataFrame, idCol: String, textCol: String,
                             tsCol: String, bands: Int = 16, rowsPerBand: Int = 4,
                             tau: Double = 0.7,
                             watermark: String = "1 hour"): Dataset[DocVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = bands * rowsPerBand
    val banded = docs
      .withColumn("sig", graft.plans.native.minhashSig(
        array_distinct(graft.plans.native.wordShingles(col(textCol), 3)), k))
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).as("ts"), col(textCol).as("text"), col("sig"),
        explode(Hashes.lshBands(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("doc_id"), col("ts"), col("text"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"), col("sig"))
      .as[BandHit]
    val verdicts = banded
      .groupByKey(h => (h.band, h.bucket))
      .transformWithState(new BucketHolderProcessor(tau, k),
        "ts", OutputMode.Append())
    verdicts
      .groupByKey(_.doc_id)
      .transformWithState(new DocVerdictProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class EmbHit(doc_id: Long, ts: Timestamp, tbl: Int, bucket: Long,
                    vec: Array[Double])
  case class EmbVote(doc_id: Long, ts: Timestamp, dup: Boolean)
  case class EmbVerdict(doc_id: Long, ts: Timestamp, is_dup: Boolean)

  /** Continuous EMBEDDING-level near-dup detection — the streaming twin
    * of `Dedup.embeddingPairs` (batch q45): random-hyperplane LSH
    * buckets with `tables`-way OR-amplification instead of minhash
    * bands. Same two-stage transformWithState shape as
    * [[nearDedupStreamMinhash]]:
    *
    *   1. keyed by (table, bucket): the first vector to claim a bucket
    *      inside the watermark horizon is held; later arrivals verify
    *      TRUE cosine against the holder (>= tau → that table votes
    *      duplicate — bucket collision alone is never a verdict). An
    *      event-time timer evicts the holder past the horizon, so
    *      state is bounded by distinct (table, bucket) keys per
    *      horizon — each holding one vector, not a corpus.
    *   2. keyed by doc id: the `tables` votes (one exploded input row
    *      → same micro-batch) OR-combine into one verdict.
    *
    * Planes are drawn from the SAME sequential gaussian stream as the
    * batch `embeddingPairs(seed, planes, tables)` — a batch-built
    * corpus and this stream agree bucket-for-bucket, so a batch
    * backfill + streaming tail see identical collision sets. */
  def nearDedupStreamEmbedding(docs: DataFrame, idCol: String, vecCol: String,
                               tsCol: String, dim: Int, tau: Double = 0.95,
                               planes: Int = 8, tables: Int = 2, seed: Long = 7L,
                               watermark: String = "1 hour"): Dataset[EmbVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(dim > 0 && planes > 0 && tables > 0, "dim, planes, tables must be positive")
    val rnd = new scala.util.Random(seed)
    // identical draw order to Dedup.embeddingPairs: table t's planes
    // are gaussian draws [t*planes*dim, (t+1)*planes*dim)
    val all = Seq.fill(tables)(Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian())))
    val keys = all.zipWithIndex.map { case (hps, t) =>
      struct(lit(t).as("tbl"),
        graft.plans.native.hyperplaneBucket(col(vecCol),
          hps.map(_.toArray).toArray).as("bucket"))
    }
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        col(vecCol).cast("array<double>").as("vec"),
        explode(array(keys: _*)).as("bk"))
      .select(col("doc_id"), col("ts"), col("bk.tbl").as("tbl"),
        col("bk.bucket").as("bucket"), col("vec"))
      .as[EmbHit]
    val votes = banded
      .groupByKey(h => (h.tbl, h.bucket))
      .transformWithState(new EmbBucketHolderProcessor(tau),
        "ts", OutputMode.Append())
    votes
      .groupByKey(_.doc_id)
      .transformWithState(new EmbVerdictProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** Stage-1 processor for [[StreamDedup.nearDedupStreamMinhash]]: holds
  * each LSH bucket's first signature; later arrivals verify overlap
  * against it. The event-time timer set at claim time evicts the
  * holder when the watermark passes it (horizon = the stream's
  * watermark delay, enforced by timer expiry at holder-ts). */
case class BucketHolder(sig: Array[Long], firstMs: Long)

class BucketHolderProcessor(tau: Double, k: Int)
    extends StatefulProcessor[(Int, Long), StreamDedup.BandHit, StreamDedup.BandVerdict] {
  import StreamDedup.{BandHit, BandVerdict}

  @transient private var holder: ValueState[BucketHolder] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    holder = getHandle.getValueState("holder",
      Encoders.product[BucketHolder], TTLConfig.NONE)

  override def handleInputRows(key: (Int, Long), rows: Iterator[BandHit],
                               timers: TimerValues): Iterator[BandVerdict] = {
    val sorted = rows.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
    val out = Seq.newBuilder[BandVerdict]
    sorted.foreach { h =>
      val cur = if (holder.exists()) Some(holder.get()) else None
      cur match {
        case None =>
          holder.update(BucketHolder(h.sig, h.ts.getTime))
          // evict once the watermark passes the holder: the horizon is
          // exactly the stream's watermark delay (clamp to wm+1 so a
          // late claim can't register an already-expired timer)
          getHandle.registerTimer(
            math.max(timers.getCurrentWatermarkInMs() + 1, h.ts.getTime + 1))
          out += BandVerdict(h.doc_id, h.ts, h.text, dup = false)
        case Some(old) =>
          var eq = 0; var i = 0
          while (i < k) { if (old.sig(i) == h.sig(i)) eq += 1; i += 1 }
          out += BandVerdict(h.doc_id, h.ts, h.text, dup = eq.toDouble / k >= tau)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[BandVerdict] = {
    if (holder.exists()) holder.clear()
    Iterator.empty
  }
}

/** Stage-2 processor: combines one document's per-band votes (one
  * exploded input row → one micro-batch, so all votes arrive together)
  * into a single verdict row. Stateless across batches by
  * construction. */
class DocVerdictProcessor
    extends StatefulProcessor[Long, StreamDedup.BandVerdict, StreamDedup.DocVerdict] {
  import StreamDedup.{BandVerdict, DocVerdict}

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

  override def handleInputRows(key: Long, rows: Iterator[BandVerdict],
                               timers: TimerValues): Iterator[DocVerdict] = {
    val vs = rows.toSeq
    if (vs.isEmpty) Iterator.empty
    else Iterator.single(DocVerdict(key, vs.map(_.ts).minBy(_.getTime),
      vs.head.text, vs.exists(_.dup)))
  }
}

/** Stage-1 processor for [[StreamDedup.nearDedupStreamEmbedding]]:
  * holds each hyperplane bucket's first vector; later arrivals verify
  * true cosine against it. Timer eviction identical to
  * [[BucketHolderProcessor]] (horizon = watermark delay). */
case class EmbHolder(vec: Array[Double], firstMs: Long)

class EmbBucketHolderProcessor(tau: Double)
    extends StatefulProcessor[(Int, Long), StreamDedup.EmbHit, StreamDedup.EmbVote] {
  import StreamDedup.{EmbHit, EmbVote}

  @transient private var holder: ValueState[EmbHolder] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    holder = getHandle.getValueState("holder",
      Encoders.product[EmbHolder], TTLConfig.NONE)

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
  }

  override def handleInputRows(key: (Int, Long), rows: Iterator[EmbHit],
                               timers: TimerValues): Iterator[EmbVote] = {
    val sorted = rows.toSeq.sortBy(h => (h.ts.getTime, h.doc_id))
    val out = Seq.newBuilder[EmbVote]
    sorted.foreach { h =>
      if (!holder.exists()) {
        holder.update(EmbHolder(h.vec, h.ts.getTime))
        getHandle.registerTimer(
          math.max(timers.getCurrentWatermarkInMs() + 1, h.ts.getTime + 1))
        out += EmbVote(h.doc_id, h.ts, dup = false)
      } else {
        out += EmbVote(h.doc_id, h.ts,
          dup = cosine(holder.get().vec, h.vec) >= tau)
      }
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[EmbVote] = {
    if (holder.exists()) holder.clear()
    Iterator.empty
  }
}

/** Stage-2 processor: OR-combines one document's per-table votes. */
class EmbVerdictProcessor
    extends StatefulProcessor[Long, StreamDedup.EmbVote, StreamDedup.EmbVerdict] {
  import StreamDedup.{EmbVote, EmbVerdict}

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

  override def handleInputRows(key: Long, rows: Iterator[EmbVote],
                               timers: TimerValues): Iterator[EmbVerdict] = {
    val vs = rows.toSeq
    if (vs.isEmpty) Iterator.empty
    else Iterator.single(EmbVerdict(key, vs.map(_.ts).minBy(_.getTime),
      vs.exists(_.dup)))
  }
}
