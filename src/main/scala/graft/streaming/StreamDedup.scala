package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

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
}
