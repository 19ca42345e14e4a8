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
  * IMAGES decode for real: payloads sniffed as PNG/JPEG/GIF/BMP go
  * through `javax.imageio` (JVM built-in — no external dependency) and
  * come back with true dimensions, channel count, and deterministic
  * color/luma features. AUDIO decodes for real for WAV/PCM via
  * `javax.sound.sampled` (also JVM built-in): true sample rate,
  * channels, frame count, RMS/envelope features. Compressed audio
  * (mp3/ogg) and VIDEO codecs are NOT in this container, so those
  * payloads fall through to clearly-marked deterministic stubs — the
  * Spark-side plumbing (schema, partition sizing, batch iteration,
  * null handling) is identical on both paths; swap the stub for a
  * JNI/FFMPEG call in production.
  */
object Binary {

  // Disable ImageIO's disk-backed stream cache once per executor JVM:
  // decode must stay in-memory (no tmp files under load).
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Magic-byte sniff for the formats javax.imageio handles natively.
    * Mime metadata can lie at corpus scale; bytes don't. */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 4 && {
      val b = payload
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||                         // GIF
      (b(0) == 'B' && b(1) == 'M')                                           // BMP
    }

  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else try {
      imageIoInit
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic 8-dim image features: mean R/G/B, mean luma, and a
    * 4-bin luma histogram — computed over a ≤64×64 sample grid so a
    * 100-megapixel scan costs the same as a thumbnail. */
  private def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
    var n = 0; var r = 0.0; var g = 0.0; var b = 0.0
    val hist = new Array[Int](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val pr = (px >> 16) & 0xff; val pg = (px >> 8) & 0xff; val pb = px & 0xff
        r += pr; g += pg; b += pb
        val luma = (0.299 * pr + 0.587 * pg + 0.114 * pb).toInt
        hist(math.min(3, luma >> 6)) += 1
        n += 1
        x += sx
      }
      y += sy
    }
    val d = math.max(1, n).toDouble
    Array(
      (r / d / 255.0).toFloat, (g / d / 255.0).toFloat, (b / d / 255.0).toFloat,
      ((0.299 * r + 0.587 * g + 0.114 * b) / d / 255.0).toFloat,
      (hist(0) / d).toFloat, (hist(1) / d).toFloat,
      (hist(2) / d).toFloat, (hist(3) / d).toFloat)
  }

  /** REAL image decode via javax.imageio — true width/height/channels
    * and deterministic features. None when the payload isn't a
    * decodable image (caller falls back to the stub). */
  def decodeImage(mediaId: Long, payload: Array[Byte]): Option[DecodedFeatures] =
    readImage(payload).map { img =>
      DecodedFeatures(mediaId, img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents, imageFeatures(img))
    }

  /** Per-row decode router: images decode for real, everything else
    * (video/audio/unknown) takes the deterministic stub. Equivalent to
    * `JvmCodec.decode` — kept as the stable per-row entrypoint. */
  def decode(mediaId: Long, payload: Array[Byte]): DecodedFeatures =
    decodeImage(mediaId, payload).getOrElse(decodeStub(mediaId, payload))

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

  /** STUB — deterministic fake decode for the modalities whose codecs
    * aren't in this container (video/audio); dimensions and features
    * derive from the bytes so tests are reproducible. Images never hit
    * this path — `decode` routes them through `decodeImage`. */
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
    * through it. Input needs (media_id, payload). The codec is the
    * injection point for modalities this container cannot decode —
    * production swaps [[JvmCodec]] for an FFmpeg/JNI implementation
    * without touching the Spark plumbing. */
  def decodeFeatures(media: DataFrame,
                     codec: Codec = JvmCodec): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init amortizes here (ImageIO config is
        // one-time per JVM; a JNI video codec would also init here)
        codec.init()
        rows.map { case (id, bytes) => codec.decode(id, bytes) }
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

  case class DecodedFrame(media_id: Long, frame_index: Int, width: Int,
                          height: Int, channels: Int,
                          features: Array[Float])

  /** Deterministic per-frame stub: the frame-i view of [[decodeStub]]
    * (byte features sampled at an index-dependent offset) so
    * codec-less environments still exercise the multi-frame schema
    * with reproducible values. */
  def decodeFrameStub(mediaId: Long, frameIndex: Int,
                      payload: Array[Byte]): DecodedFrame = {
    val n = if (payload == null) 0 else payload.length
    val base = decodeStub(mediaId, payload)
    val feats = Array.tabulate(8) { i =>
      if (n == 0) 0f else payload((i + frameIndex * 7) % n).toFloat / 128f
    }
    DecodedFrame(mediaId, frameIndex, base.width, base.height,
      base.channels, feats)
  }

  /** Default multi-frame decode for codecs without a video path:
    * frame 0 through the codec's single-frame `decode` (real for
    * images / ffmpeg-first-frame), frames 1..n−1 deterministic stubs.
    * [[FfmpegCodec]] overrides this with real fps-sampled frames. */
  def decodeFramesDefault(codec: Codec, mediaId: Long,
                          payload: Array[Byte],
                          maxFrames: Int): Seq[DecodedFrame] = {
    val first = codec.decode(mediaId, payload)
    DecodedFrame(mediaId, 0, first.width, first.height, first.channels,
      first.features) +:
      (1 until maxFrames).map(i => decodeFrameStub(mediaId, i, payload))
  }

  /** Batched MULTI-FRAME decode — the video sibling of
    * [[decodeFeatures]]: one codec session per partition, each payload
    * fans out to ≤ `maxFrames` (media_id, frame_index) feature rows
    * inside the task (flatMap — frames never materialize as payload
    * copies in the shuffle). Pair with [[repartitionForDecode]] so a
    * partition's decode work is byte-balanced before the fan-out. */
  def decodeFrameFeatures(media: DataFrame, maxFrames: Int,
                          codec: Codec = JvmCodec): Dataset[DecodedFrame] = {
    require(maxFrames >= 1, s"need maxFrames >= 1, got $maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        codec.init()
        rows.flatMap { case (id, bytes) =>
          codec.decodeFrames(id, bytes, maxFrames)
        }
      }
  }

  /** Frame-sample stand-in: pick every `stride`-th byte window as a
    * "frame" — exercises the explode/repartition shape of video frame
    * extraction without a video codec. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
        explode(sequence(lit(0L), greatest(col("n_bytes") - 1, lit(0L)), lit(stride.toLong)))
          .as("frame_offset"))
      .select(col("media_id"), col("frame_offset"))

  /** Resize at a target resolution. Images scale for REAL (bilinear
    * Graphics2D draw onto a target-sized buffer, features recomputed
    * from the scaled pixels); non-image payloads keep the deterministic
    * stub transform so the partitioning / schema / batch shape are
    * exercised identically for modalities without a codec. */
  def resize(media: DataFrame, targetW: Int, targetH: Int): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          readImage(bytes) match {
            case Some(img) =>
              val scaled = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = scaled.createGraphics()
              g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, targetW, targetH, null)
              g2.dispose()
              DecodedFeatures(id, targetW, targetH,
                img.getColorModel.getNumComponents, imageFeatures(scaled))
            case None =>
              val base = decodeStub(id, bytes)
              base.copy(width = targetW, height = targetH,
                features = base.features.map(_ * (targetW.toFloat / math.max(base.width, 1))))
          }
        }
      }
  }

  /** Back-compat alias from the rounds where resize was stub-only. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): Dataset[DecodedFeatures] =
    resize(media, targetW, targetH)

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
    * This is the spill path `oversized` routes to: it bounds CODEC
    * batch memory to ~chunkBytes per call. Honest limits: a single
    * Spark binary value caps at 2 GiB, so this path carries payloads
    * up to that — not arbitrarily large ones — and the pre-projection
    * explode pairs each offset with the full payload row (whole-stage
    * codegen pipelines it per-row; the payload is not duplicated into
    * a materialized intermediate, but it is re-read per chunk).
    * Payloads beyond 2 GiB need a file-reference column and a
    * range-read codec, not an inline binary. */
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

  // ---- audio: REAL WAV/PCM decode via javax.sound.sampled (JVM
  // built-in, same no-external-dependency rationale as javax.imageio
  // for images). Compressed formats (mp3/ogg/aac) have no JVM codec
  // and fall through to the stub; video stays stubbed.

  /** RIFF/WAVE magic sniff. */
  def looksLikeWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'

  case class DecodedAudio(media_id: Long, sample_rate: Int, channels: Int,
                          n_frames: Long, features: Array[Float])

  /** REAL audio decode: true sample rate / channel count / frame count
    * plus deterministic 8-dim features over channel-0 PCM — mean |amp|,
    * RMS, peak, zero-crossing rate, and per-quarter RMS envelope.
    * None when the payload isn't decodable WAV/PCM. */
  def decodeAudio(mediaId: Long, payload: Array[Byte]): Option[DecodedAudio] =
    if (!looksLikeWav(payload)) None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frameSize = fmt.getFrameSize
        val bits = fmt.getSampleSizeInBits
        if (frameSize <= 0 || (bits != 8 && bits != 16)) None
        else {
          val bytes = ais.readAllBytes()
          val nFrames = bytes.length / frameSize
          val bigEndian = fmt.isBigEndian
          def sample(i: Int): Double = {
            val off = i * frameSize
            if (bits == 16) {
              val lo = bytes(off + (if (bigEndian) 1 else 0)) & 0xff
              val hi = bytes(off + (if (bigEndian) 0 else 1)).toInt
              ((hi << 8) | lo).toShort / 32768.0
            } else (bytes(off) & 0xff) / 255.0 * 2.0 - 1.0 // 8-bit unsigned
          }
          var sumAbs = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0
          val quarters = new Array[Double](4)
          var prev = 0.0
          var i = 0
          while (i < nFrames) {
            val v = sample(i)
            val a = math.abs(v)
            sumAbs += a; sumSq += v * v
            if (a > peak) peak = a
            if (i > 0 && (v >= 0) != (prev >= 0)) zc += 1
            quarters(math.min(3, (i.toLong * 4 / math.max(1, nFrames)).toInt)) += v * v
            prev = v
            i += 1
          }
          val d = math.max(1, nFrames).toDouble
          val q = quarters.map(s => math.sqrt(s / math.max(1.0, d / 4)).toFloat)
          Some(DecodedAudio(mediaId, fmt.getSampleRate.toInt, fmt.getChannels,
            nFrames.toLong, Array((sumAbs / d).toFloat,
              math.sqrt(sumSq / d).toFloat, peak.toFloat, (zc / d).toFloat,
              q(0), q(1), q(2), q(3))))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The 8-dim audio feature vector over raw s16le MONO PCM bytes —
    * the same math [[decodeAudio]] runs over decoded WAV frames
    * (mean |amp|, RMS, peak, zero-crossing rate, per-quarter RMS
    * envelope), shared with the FFmpeg transcode path so compressed
    * audio and WAV land in one feature space. */
  def featuresFromPcm16leMono(pcm: Array[Byte]): Array[Float] = {
    val nFrames = pcm.length / 2
    var sumAbs = 0.0; var sumSq = 0.0; var peak = 0.0; var zc = 0
    val quarters = new Array[Double](4)
    var prev = 0.0
    var i = 0
    while (i < nFrames) {
      val lo = pcm(2 * i) & 0xff
      val hi = pcm(2 * i + 1).toInt
      val v = ((hi << 8) | lo).toShort / 32768.0
      val a = math.abs(v)
      sumAbs += a; sumSq += v * v
      if (a > peak) peak = a
      if (i > 0 && (v >= 0) != (prev >= 0)) zc += 1
      quarters(math.min(3, (i.toLong * 4 / math.max(1, nFrames)).toInt)) += v * v
      prev = v
      i += 1
    }
    val d = math.max(1, nFrames).toDouble
    val q = quarters.map(s => math.sqrt(s / math.max(1.0, d / 4)).toFloat)
    Array((sumAbs / d).toFloat, math.sqrt(sumSq / d).toFloat, peak.toFloat,
      (zc / d).toFloat, q(0), q(1), q(2), q(3))
  }

  /** STUB for modalities without a JVM codec (compressed audio, video);
    * deterministic byte-derived values, same contract as decodeStub. */
  def decodeAudioStub(mediaId: Long, payload: Array[Byte]): DecodedAudio = {
    val n = if (payload == null) 0 else payload.length
    DecodedAudio(mediaId, 16000, 1, n.toLong,
      Array.tabulate(8)(i => if (n == 0) 0f else payload(i % n).toFloat / 128f))
  }

  /** Batched audio decode: WAV/PCM decodes for real, everything else
    * takes the stub — same mapPartitions batch shape as
    * decodeFeatures; the codec injects mp3/ogg/aac support in
    * production. */
  def decodeAudioFeatures(media: DataFrame,
                          codec: Codec = JvmCodec): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        codec.init()
        rows.map { case (id, bytes) => codec.decodeAudio(id, bytes) }
      }
  }
}

/** Codec SPI: the seam between graft's Spark-side media plumbing
  * (schema, size-aware partitioning, batched mapPartitions iteration)
  * and the actual byte decoders. Implementations must be Serializable —
  * the codec rides into task closures. `init()` runs once per
  * partition, where a native codec loads its libraries / allocates a
  * context; the default is a no-op.
  *
  * Production injects an FFmpeg/JNI-backed implementation to light up
  * video and compressed audio without forking [[Binary]]; this
  * container ships [[JvmCodec]] (real javax image/WAV decode, honest
  * deterministic stubs beyond that) and [[StubCodec]] (stubs only, for
  * tests and codec-less environments). */
trait Codec extends Serializable {
  def init(): Unit = ()
  def decode(mediaId: Long, payload: Array[Byte]): Binary.DecodedFeatures
  def decodeAudio(mediaId: Long, payload: Array[Byte]): Binary.DecodedAudio
  /** Multi-frame video decode: ≤ maxFrames sampled frames with real
    * per-frame features where the codec can extract them. Default
    * (source-compatible for existing codecs): frame 0 via `decode`,
    * later frames deterministic stubs — see
    * [[Binary.decodeFramesDefault]]. */
  def decodeFrames(mediaId: Long, payload: Array[Byte],
                   maxFrames: Int): Seq[Binary.DecodedFrame] =
    Binary.decodeFramesDefault(this, mediaId, payload, maxFrames)
}

object Codec {
  /** PRODUCTION injection path: resolve a codec by fully-qualified
    * class name. The FFmpeg/JNI implementation ships in its own jar on
    * the driver/executor classpath (`--jars`) and is selected by
    * config — graft takes NO compile-time dependency on it. Accepts a
    * Scala `object` (`...$` / MODULE$) or any no-arg-constructible
    * class implementing [[Codec]]. */
  def load(className: String): Codec = {
    def moduleOf(name: String): Option[Codec] =
      try Some(Class.forName(name).getField("MODULE$").get(null).asInstanceOf[Codec])
      catch {
        case _: ClassNotFoundException | _: NoSuchFieldException => None
      }
    // a Scala `object Foo` lives in class Foo$ (the bare Foo, if
    // present, is only a static forwarder with no MODULE$ and no ctor)
    moduleOf(className + "$").orElse(moduleOf(className)).getOrElse(
      Class.forName(className).getDeclaredConstructor()
        .newInstance().asInstanceOf[Codec])
  }
}

/** Default codec: javax.imageio images + javax.sound.sampled WAV/PCM
  * for real; video and compressed audio fall through to the
  * deterministic stubs (no codec libs in this container). */
object JvmCodec extends Codec {
  override def decode(mediaId: Long, payload: Array[Byte]): Binary.DecodedFeatures =
    Binary.decode(mediaId, payload)
  override def decodeAudio(mediaId: Long, payload: Array[Byte]): Binary.DecodedAudio =
    Binary.decodeAudio(mediaId, payload)
      .getOrElse(Binary.decodeAudioStub(mediaId, payload))
}

/** Stub-only codec: every modality takes the deterministic byte-derived
  * fake — the codec-less environment baseline, and the spec's proof
  * that the SPI actually switches the decode path. */
object StubCodec extends Codec {
  override def decode(mediaId: Long, payload: Array[Byte]): Binary.DecodedFeatures =
    Binary.decodeStub(mediaId, payload)
  override def decodeAudio(mediaId: Long, payload: Array[Byte]): Binary.DecodedAudio =
    Binary.decodeAudioStub(mediaId, payload)
}
