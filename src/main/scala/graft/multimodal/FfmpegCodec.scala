package graft.multimodal

/** FFmpeg-CLI [[Codec]]: lights up compressed audio (mp3/ogg/aac) and
  * video first-frame decode through the stock `ffmpeg` binary when it
  * is installed, with NO compile-time dependency and no JNI — the
  * production-injection story the SPI promises ([[Codec.load]])
  * demonstrated end-to-end inside the repo.
  *
  * Decode strategy, per payload:
  *  - images and WAV/PCM take the real JVM path ([[JvmCodec]]'s
  *    javax.imageio / javax.sound decoders) — no subprocess for what
  *    the JVM already decodes;
  *  - anything else, when `ffmpeg` is on PATH: audio transcodes to
  *    s16le mono 16 kHz PCM over stdin/stdout pipes (no temp files)
  *    and runs the same 8-dim feature math as the WAV path; visual
  *    payloads extract frame 1 as PNG, which then rides the normal
  *    imageio path — one subprocess per payload, streamed, bounded;
  *  - no binary, or ffmpeg fails on the bytes: the deterministic
  *    stubs, same as [[JvmCodec]] — the honest fallback, never a
  *    crash.
  *
  * Scale posture: the subprocess runs inside the executor task (the
  * mapPartitions batch shape of Binary.decodeFeatures), so a cluster
  * decodes media at partition parallelism; `init()` probes binary
  * presence once per partition, not per row. Stdout/stderr are fully
  * drained on separate threads — a chatty encoder can't deadlock the
  * pipe buffers.
  */
object FfmpegCodec extends Codec {

  /** PATH probe — cheap enough to call per partition via init(). */
  @transient @volatile private var availableCache: java.lang.Boolean = null
  def available: Boolean = {
    if (availableCache == null) availableCache = {
      val path = Option(System.getenv("PATH")).getOrElse("")
      path.split(java.io.File.pathSeparator).exists { d =>
        new java.io.File(d, "ffmpeg").canExecute
      }
    }
    availableCache.booleanValue()
  }

  override def init(): Unit = available

  /** Run ffmpeg with the payload on stdin, return stdout bytes; None
    * on non-zero exit / missing binary / any IO failure. */
  private[multimodal] def run(args: Seq[String],
                              payload: Array[Byte]): Option[Array[Byte]] =
    if (!available) None
    else try {
      val pb = new ProcessBuilder(
        (Seq("ffmpeg", "-hide_banner", "-loglevel", "error", "-i", "pipe:0")
          ++ args ++ Seq("pipe:1")): _*)
      val p = pb.start()
      val out = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => {
        val buf = new Array[Byte](64 * 1024)
        val in = p.getInputStream
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      })
      val err = new Thread(() => {
        val in = p.getErrorStream
        while (in.read() >= 0) () // drain, discard
      })
      drain.setDaemon(true); err.setDaemon(true)
      drain.start(); err.start()
      try { p.getOutputStream.write(payload); p.getOutputStream.close() }
      catch { case _: java.io.IOException => () } // encoder closed early
      // Bounded wait: a wedged ffmpeg must degrade to the stub
      // fallback (None), not hang the executor task forever.
      val finished =
        p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) { p.destroyForcibly(); p.waitFor() }
      val ok = finished && p.exitValue() == 0
      drain.join(10000); err.join(1000)
      if (ok && out.size() > 0) Some(out.toByteArray) else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Compressed audio → s16le mono 16 kHz PCM via ffmpeg. */
  private def transcodeAudio(payload: Array[Byte]): Option[Array[Byte]] =
    run(Seq("-f", "s16le", "-ac", "1", "-ar", "16000"), payload)

  /** First video frame (or the image itself) as PNG via ffmpeg. */
  private def firstFramePng(payload: Array[Byte]): Option[Array[Byte]] =
    run(Seq("-frames:v", "1", "-f", "image2", "-vcodec", "png"), payload)

  /** Up to `maxFrames` fps-sampled frames as a concatenated PNG
    * stream (`image2pipe`), split on the PNG signature. One ffmpeg
    * run per payload regardless of frame count. */
  private[multimodal] def framePngs(payload: Array[Byte], maxFrames: Int,
                                    fps: Double): Seq[Array[Byte]] =
    run(Seq("-vf", s"fps=$fps", "-frames:v", maxFrames.toString,
      "-f", "image2pipe", "-vcodec", "png"), payload)
      .map(splitPngStream).getOrElse(Seq.empty)

  /** Split a concatenated PNG byte stream at each PNG signature —
    * image2pipe writes frames back to back with no framing of its
    * own; the 8-byte signature cannot occur inside a well-formed PNG
    * chunk stream's critical positions at frame starts, and a false
    * split would simply fail imageio and drop to the stub. */
  private[multimodal] def splitPngStream(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    def isSigAt(i: Int): Boolean =
      i + sig.length <= bytes.length &&
        (0 until sig.length).forall(j => bytes(i + j) == sig(j))
    val starts = (0 to bytes.length - sig.length).filter(isSigAt)
    starts.zipWithIndex.map { case (s, i) =>
      val end = if (i + 1 < starts.length) starts(i + 1) else bytes.length
      java.util.Arrays.copyOfRange(bytes, s, end)
    }
  }

  override def decode(mediaId: Long,
                      payload: Array[Byte]): Binary.DecodedFeatures =
    Binary.decodeImage(mediaId, payload)
      .orElse(firstFramePng(payload)
        .flatMap(png => Binary.decodeImage(mediaId, png)))
      .getOrElse(Binary.decodeStub(mediaId, payload))

  /** REAL multi-frame sampling: one ffmpeg run extracts ≤ maxFrames
    * fps-sampled frames as PNGs; each rides the normal imageio
    * feature path, so frames 2..n carry real per-frame features —
    * not the stub echo of frame 1. Falls back to the default shape
    * (frame 1 best-effort + stubs) when ffmpeg is missing or the
    * payload defeats it. Sampling rate fixed at 1 fps — the
    * training-data convention of frame-per-second thumbnailing;
    * callers needing denser sampling run framePngs directly. */
  override def decodeFrames(mediaId: Long, payload: Array[Byte],
                            maxFrames: Int): Seq[Binary.DecodedFrame] = {
    val real = framePngs(payload, maxFrames, fps = 1.0)
      .take(maxFrames).zipWithIndex.flatMap { case (png, i) =>
        Binary.decodeImage(mediaId, png).map(f =>
          Binary.DecodedFrame(mediaId, i, f.width, f.height, f.channels,
            f.features))
      }
    if (real.nonEmpty) real
    else Binary.decodeFramesDefault(this, mediaId, payload, maxFrames)
  }

  override def decodeAudio(mediaId: Long,
                           payload: Array[Byte]): Binary.DecodedAudio =
    Binary.decodeAudio(mediaId, payload)
      .orElse(transcodeAudio(payload).map { pcm =>
        val f = Binary.featuresFromPcm16leMono(pcm)
        Binary.DecodedAudio(mediaId, 16000, 1, pcm.length / 2L, f)
      })
      .getOrElse(Binary.decodeAudioStub(mediaId, payload))
}
