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

  override def decode(mediaId: Long,
                      payload: Array[Byte]): Binary.DecodedFeatures =
    Binary.decodeImage(mediaId, payload)
      .orElse(firstFramePng(payload)
        .flatMap(png => Binary.decodeImage(mediaId, png)))
      .getOrElse(Binary.decodeStub(mediaId, payload))

  override def decodeAudio(mediaId: Long,
                           payload: Array[Byte]): Binary.DecodedAudio =
    Binary.decodeAudio(mediaId, payload)
      .orElse(transcodeAudio(payload).map { pcm =>
        val f = Binary.featuresFromPcm16leMono(pcm)
        Binary.DecodedAudio(mediaId, 16000, 1, pcm.length / 2L, f)
      })
      .getOrElse(Binary.decodeAudioStub(mediaId, payload))
}
