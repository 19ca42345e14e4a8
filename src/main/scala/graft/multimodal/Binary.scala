package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batched in `mapPartitions` so a codec can
  * amortize init per task (the Scala twin of Python's mapInPandas batch
  * shape).
  *
  * The actual codecs are NOT in this container, so `decodeStub` is a
  * clearly-marked deterministic fake — the Spark-side plumbing (schema,
  * partition sizing, batch iteration, null handling) is real and
  * tested; swap `decodeStub` for a JNI/FFMPEG call in production.
  */
object Binary {

  /** Media row schema: payload + typed metadata, the layout a 100 TB
    * multimodal lake would use (payload column last → parquet column
    * pruning skips it for metadata-only queries). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("payload", BinaryType)))

  case class DecodedFeatures(media_id: Long, width: Int, height: Int,
                             channels: Int, features: Array[Float])

  /** STUB — deterministic fake decode. Real implementation would hand
    * the byte buffer to an image codec; here dimensions and features
    * derive from the bytes so tests are reproducible. */
  def decodeStub(mediaId: Long, payload: Array[Byte]): DecodedFeatures = {
    val n = if (payload == null) 0 else payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val feats = Array.tabulate(8) { i =>
      if (n == 0) 0f
      else payload(i % n).toFloat / 128f
    }
    DecodedFeatures(mediaId, width, height, 3, feats)
  }

  /** Batched decode: one codec "session" per partition, rows streamed
    * through it. Input needs (media_id, payload). */
  def decodeFeatures(media: DataFrame): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here (expensive, amortized)
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Deterministic synthetic media table derived from a text table —
    * payload bytes are the UTF-8 text, standing in for real media so the
    * plumbing is exercised end-to-end on the driver test data. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("application/octet-stream").as("mime"),
      length(col(textCol)).cast("long").as("n_bytes"),
      col(textCol).cast("binary").as("payload"))

  /** Frame-sample stand-in: pick every `stride`-th byte window as a
    * "frame" — exercises the explode/repartition shape of video frame
    * extraction without a video codec. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), greatest(col("n_bytes") - 1, lit(0L)), lit(stride.toLong)))
          .as("frame_offset"))
      .select(col("media_id"), col("frame_offset"))

  /** Resize stand-in: recompute features at a target resolution. STUB —
    * a real implementation scales pixels; here output dims are exact
    * and the feature recompute is deterministic, so the partitioning /
    * schema / batch shape are tested for real. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val base = decodeStub(id, bytes)
          base.copy(width = targetW, height = targetH,
            features = base.features.map(_ * (targetW.toFloat / math.max(base.width, 1))))
        }
      }
  }

  /** Size-aware repartitioning for decode: pick the partition count
    * from total payload bytes so each decode task holds ≈
    * `targetBytesPerPartition` (codec memory ≈ batch bytes, so record
    * counts are the wrong unit for media). Hash distribution is uniform
    * in expectation; single payloads larger than the target can still
    * skew a task — gate them with `oversized` first. */
  def repartitionForDecode(media: DataFrame,
                           targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val total = media.agg(sum(coalesce(col("n_bytes"), lit(0L))))
      .first().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
    media.repartition(parts, col("media_id"))
  }

  /** Payloads too large for one decode batch — route these to a
    * dedicated path (chunked decode or rejection) instead of letting
    * one 4 GB video melt a uniform task. */
  def oversized(media: DataFrame, maxPayloadBytes: Long): DataFrame =
    media.where(coalesce(col("n_bytes"), lit(0L)) > maxPayloadBytes)

  /** Chunked decode for oversized payloads: slice the payload into
    * `chunkBytes` pieces with a binary substring (no driver round
    * trip), decode each chunk through the same batched shape, then
    * merge per media id (first chunk's dims, element-mean features).
    * This is the spill path `oversized` routes to — one 4 GB payload
    * flows through fixed-size decode batches instead of one task. */
  def chunkedDecodeFeatures(media: DataFrame, chunkBytes: Int): Dataset[DecodedFeatures] = {
    require(chunkBytes > 0, "chunkBytes must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val chunks = media
      .select(col("media_id").cast("long").as("media_id"), col("payload"),
        coalesce(col("n_bytes"), lit(0L)).as("nb"))
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0L), greatest(col("nb") - 1, lit(0L)),
          lit(chunkBytes.toLong))).as("off"))
      .select(col("media_id"), col("off"),
        expr(s"substring(payload, off + 1, $chunkBytes)").as("chunk"))
      .as[(Long, Long, Array[Byte])]
    chunks
      .mapPartitions { rows =>
        rows.map { case (id, off, bytes) => (id, off, decodeStub(id, bytes)) }
      }
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val parts = it.toSeq.sortBy(_._2).map(_._3)
        val feats = Array.tabulate(8)(i =>
          parts.map(_.features(i)).sum / parts.size)
        parts.head.copy(media_id = id, features = feats)
      }
  }

  /** Audio-style frame windows over the payload: fixed-length windows
    * with hop — the (window, hop) shape of spectrogram extraction. */
  def audioWindows(media: DataFrame, windowBytes: Int, hopBytes: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L),
          greatest(col("n_bytes") - windowBytes, lit(0L)), lit(hopBytes.toLong)))
          .as("window_start"))
      .select(col("media_id"), col("window_start"),
        least(col("window_start") + windowBytes, col("n_bytes")).as("window_end"))
}
