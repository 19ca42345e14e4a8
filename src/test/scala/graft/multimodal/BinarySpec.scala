package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec coverage for the image path: actual PNG/JPEG bytes are
  * built in-test with the same JVM ImageIO that production writes with,
  * decoded through the distributed batched shape, and checked for TRUE
  * dimensions, channels, and pixel-derived features. */
class BinarySpec extends SparkSpec {

  /** 20×10 RGB: left half pure red, right half pure blue. */
  private def twoToneImage(): BufferedImage = {
    val img = new BufferedImage(20, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20)
      img.setRGB(x, y, if (x < 10) 0xff0000 else 0x0000ff)
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JVM has no $fmt writer")
    bos.toByteArray
  }

  test("decodeFeatures decodes a real PNG end-to-end: dims, channels, colors") {
    val s = spark
    import s.implicits._
    val png = encode(twoToneImage(), "png")
    assert(Binary.looksLikeImage(png))
    val media = Seq((1L, "image/png", png.length.toLong, png))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeFeatures(media).collect()(0)
    assert(out.width == 20 && out.height == 10)
    assert(out.channels == 3)
    // left half red + right half blue: meanR = meanB = 0.5, meanG = 0
    assert(math.abs(out.features(0) - 0.5f) < 1e-3, s"meanR=${out.features(0)}")
    assert(out.features(1) == 0.0f)
    assert(math.abs(out.features(2) - 0.5f) < 1e-3)
    // all pixels are dark (luma < 128): histogram mass in the low bins
    assert(out.features(4) + out.features(5) == 1.0f)
  }

  test("decodeFeatures decodes a real JPEG: true dimensions survive lossy coding") {
    val s = spark
    import s.implicits._
    val jpg = encode(twoToneImage(), "jpg")
    assert(Binary.looksLikeImage(jpg))
    val media = Seq((7L, "image/jpeg", jpg.length.toLong, jpg))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeFeatures(media).collect()(0)
    assert(out.media_id == 7L)
    assert(out.width == 20 && out.height == 10 && out.channels == 3)
    // JPEG is lossy: colors only approximately round-trip
    assert(math.abs(out.features(0) - 0.5f) < 0.1f)
  }

  test("non-image payloads fall back to the deterministic stub") {
    val s = spark
    import s.implicits._
    val bytes = "definitely not an image".getBytes("UTF-8")
    assert(!Binary.looksLikeImage(bytes))
    val media = Seq((3L, "video/mp4", bytes.length.toLong, bytes))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeFeatures(media).collect()(0)
    val stub = Binary.decodeStub(3L, bytes)
    assert(out == stub.copy(features = out.features) &&
      out.features.sameElements(stub.features))
  }

  test("corrupt image-magic payload degrades to the stub, not an exception") {
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x00, 0x01, 0x02)
    assert(Binary.looksLikeImage(corrupt))
    assert(Binary.decodeImage(9L, corrupt).isEmpty)
    val got = Binary.decode(9L, corrupt)
    val stub = Binary.decodeStub(9L, corrupt)
    assert(got.width == stub.width && got.height == stub.height &&
      got.channels == stub.channels && got.features.sameElements(stub.features))
  }

  test("resize scales a real image and recomputes features from scaled pixels") {
    val s = spark
    import s.implicits._
    val png = encode(twoToneImage(), "png")
    val media = Seq((1L, "image/png", png.length.toLong, png))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.resize(media, 8, 8).collect()(0)
    assert(out.width == 8 && out.height == 8)
    // the red/blue split survives a bilinear downscale
    assert(out.features(0) > 0.3f && out.features(2) > 0.3f)
    assert(out.features(1) < 0.2f)
  }

  test("mixed image and non-image batch decodes through one partition pass") {
    val s = spark
    import s.implicits._
    val png = encode(twoToneImage(), "png")
    val txt = "audio-ish payload".getBytes("UTF-8")
    val media = Seq(
      (1L, "image/png", png.length.toLong, png),
      (2L, "audio/wav", txt.length.toLong, txt)
    ).toDF("media_id", "mime", "n_bytes", "payload").repartition(1)
    val out = Binary.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(out(0).width == 20 && out(0).height == 10) // real decode
    assert(out(1) == Binary.decodeStub(2L, txt)
      .copy(features = out(1).features)) // stub path
  }

  /** 16-bit mono PCM WAV of a full-scale-ish sine at `hz`. */
  private def sineWav(hz: Double, sampleRate: Int, nFrames: Int,
                      amplitude: Double = 0.8): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val v = (math.sin(2 * math.Pi * hz * i / sampleRate) * amplitude * 32767).toInt
      pcm(2 * i) = (v & 0xff).toByte          // little-endian lo
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudioFeatures decodes a real WAV: rate, frames, RMS physics") {
    val s = spark
    import s.implicits._
    val wav = sineWav(hz = 440, sampleRate = 8000, nFrames = 8000)
    assert(Binary.looksLikeWav(wav))
    val media = Seq((7L, "audio/wav", wav.length.toLong, wav))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeAudioFeatures(media).collect()(0)
    assert(out.sample_rate == 8000 && out.channels == 1 && out.n_frames == 8000)
    // a sine of amplitude A has RMS A/sqrt(2) ≈ 0.566 and peak ≈ A
    assert(math.abs(out.features(1) - 0.8 / math.sqrt(2)) < 0.02,
      s"sine RMS off: ${out.features(1)}")
    assert(out.features(2) > 0.75f && out.features(2) <= 0.81f)
    // 440 Hz over 1 s ≈ 880 zero crossings → rate ≈ 0.11 per frame
    assert(math.abs(out.features(3) - 880.0 / 8000) < 0.01)
    // quarters of a steady sine have equal energy
    val q = out.features.slice(4, 8)
    assert(q.max - q.min < 0.05, s"uneven envelope: ${q.toSeq}")
  }

  test("compressed-audio payloads fall back to the audio stub") {
    val s = spark
    import s.implicits._
    val fakeMp3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0) ++
      Array.fill[Byte](50)(33)
    val media = Seq((8L, "audio/mpeg", fakeMp3.length.toLong, fakeMp3))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeAudioFeatures(media).collect()(0)
    assert(out == Binary.decodeAudioStub(8L, fakeMp3)
      .copy(features = out.features))
    // corrupt RIFF header degrades to the stub, not an exception
    val corrupt = "RIFFxxxxWAVEgarbage".getBytes("UTF-8")
    assert(Binary.looksLikeWav(corrupt))
    val out2 = Binary.decodeAudioFeatures(
      Seq((9L, "audio/wav", corrupt.length.toLong, corrupt))
        .toDF("media_id", "mime", "n_bytes", "payload")).collect()(0)
    assert(out2.sample_rate == 16000) // stub's deterministic rate
  }

  test("FfmpegCodec: WAV and images take the JVM path; beyond-JVM " +
    "payloads transcode when ffmpeg exists, stub honestly when not") {
    // WAV always decodes for real (no subprocess involved)
    val wav = sineWav(hz = 440, sampleRate = 8000, nFrames = 4000)
    val real = FfmpegCodec.decodeAudio(1L, wav)
    assert(real.sample_rate == 8000 && real.n_frames == 4000L)
    // feature math parity: the shared PCM-mono helper == the WAV path
    val viaHelper = Binary.featuresFromPcm16leMono(
      java.util.Arrays.copyOfRange(wav, 44, wav.length)) // RIFF hdr = 44B
    real.features.zip(viaHelper).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4, s"$a vs $b") }
    // a fake-mp3 payload: with no ffmpeg on PATH this must be the
    // deterministic stub; with ffmpeg it must still never throw
    val junk = Array.tabulate[Byte](256)(i => i.toByte)
    val a = FfmpegCodec.decodeAudio(2L, junk)
    if (!FfmpegCodec.available) {
      val st = Binary.decodeAudioStub(2L, junk)
      assert(a.sample_rate == st.sample_rate && a.n_frames == st.n_frames &&
        a.features.sameElements(st.features))
    } else assert(a.n_frames >= 0)
    val v = FfmpegCodec.decode(3L, junk)
    if (!FfmpegCodec.available) {
      val st = Binary.decodeStub(3L, junk)
      assert(v.width == st.width && v.height == st.height &&
        v.features.sameElements(st.features))
    }
    // when ffmpeg IS installed, prove the real transcode path with
    // media ffmpeg itself synthesizes (skipped honestly otherwise)
    if (FfmpegCodec.available) {
      val mp3 = FfmpegCodec.run(Seq("-f", "mp3"), wav)
      mp3.foreach { bytes =>
        val d = FfmpegCodec.decodeAudio(4L, bytes)
        assert(d.sample_rate == 16000 && d.channels == 1)
        assert(d.n_frames > 6000 && d.n_frames < 10000) // ~0.5s at 16k
      }
    }
    // SPI wiring: resolvable by name like any external codec jar
    assert(Codec.load("graft.multimodal.FfmpegCodec").isInstanceOf[Codec])
  }

  test("Codec SPI: an injected codec replaces the decode path wholesale") {
    val s = spark
    import s.implicits._
    // a fake "FFmpeg" standing where production's JNI codec would go —
    // recognizable constants no real or stub path produces, plus an
    // init marker proving per-partition initialization runs
    object FakeFfmpeg extends Codec {
      override def init(): Unit = FakeInitProbe.mark()
      override def decode(id: Long, payload: Array[Byte]): Binary.DecodedFeatures =
        Binary.DecodedFeatures(id, 1920, 1080, 3, Array.fill(8)(0.5f))
      override def decodeAudio(id: Long, payload: Array[Byte]): Binary.DecodedAudio =
        Binary.DecodedAudio(id, 44100, 2, 12345L, Array.fill(8)(0.25f))
    }
    FakeInitProbe.reset()
    val png = encode(twoToneImage(), "png")
    val media = Seq(
      (1L, "image/png", png.length.toLong, png),
      (2L, "video/mp4", 10L, Array.fill[Byte](10)(7))
    ).toDF("media_id", "mime", "n_bytes", "payload")
    // default JvmCodec: the PNG decodes for real
    val jvm = Binary.decodeFeatures(media).collect().sortBy(_.media_id)
    assert(jvm(0).width == 20 && jvm(0).height == 10)
    // injected codec: EVERY payload goes through the fake — same
    // plumbing, different decoder, no Binary fork
    val fake = Binary.decodeFeatures(media, FakeFfmpeg).collect().sortBy(_.media_id)
    assert(fake.forall(f => f.width == 1920 && f.height == 1080))
    assert(FakeInitProbe.count() > 0, "codec init() never ran in tasks")
    val fakeAudio = Binary.decodeAudioFeatures(media, FakeFfmpeg).collect()
    assert(fakeAudio.forall(a => a.sample_rate == 44100 && a.n_frames == 12345L))
    // StubCodec on an image: proves the SPI switches even the real path
    val stub = Binary.decodeFeatures(media, StubCodec).collect().sortBy(_.media_id)
    assert(stub(0).width == 16 + (png.length % 64)) // stub dims, not 20×10
  }

  test("Codec.load resolves a codec by class name — the external-jar wiring") {
    val s = spark
    import s.implicits._
    // production selects the codec by config string; graft.main has no
    // compile-time reference to JarShapedCodec (test sources stand in
    // for the external jar on the classpath)
    val codec = Codec.load("graft.multimodal.JarShapedCodec")
    val media = Seq((1L, "video/mp4", 4L, Array.fill[Byte](4)(9)))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeFeatures(media, codec).collect()(0)
    assert(out.width == 7680 && out.height == 4320) // the jar codec's marker dims
    // Scala objects resolve too (MODULE$ / trailing-$ both accepted)
    assert(Codec.load("graft.multimodal.StubCodec").isInstanceOf[Codec])
  }

  test("decodeFrameFeatures: maxFrames fan-out per payload; frame 0 " +
    "real for images, later frames deterministic stubs (default codec)") {
    val s = spark
    import s.implicits._
    val png = encode(twoToneImage(), "png")
    val junk = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val media = Seq(
      (1L, "image/png", png.length.toLong, png),
      (2L, "video/mp4", junk.length.toLong, junk))
      .toDF("media_id", "mime", "n_bytes", "payload")
    val out = Binary.decodeFrameFeatures(media, maxFrames = 3).collect()
      .sortBy(f => (f.media_id, f.frame_index))
    assert(out.length == 6) // 2 payloads × 3 frames
    assert(out.map(f => (f.media_id, f.frame_index)).toSeq ==
      Seq((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1), (2L, 2)))
    // image frame 0: the REAL decode (20×10 two-tone)
    assert(out(0).width == 20 && out(0).height == 10)
    // image frames 1..2: the stub shape, index-dependent features
    val s1 = Binary.decodeFrameStub(1L, 1, png)
    assert(out(1).features.sameElements(s1.features))
    assert(!out(1).features.sameElements(out(2).features),
      "frame stubs must vary by index")
    // non-image frame 0 equals the single-frame stub decode
    assert(out(3).features.sameElements(Binary.decodeStub(2L, junk).features))
  }

  test("FfmpegCodec.decodeFrames: PNG-stream splitter is exact; real " +
    "multi-frame sampling where ffmpeg exists, default shape where not") {
    val png = encode(twoToneImage(), "png")
    // splitter: two concatenated PNGs come back apart and decodable
    val two = png ++ png
    val split = FfmpegCodec.splitPngStream(two)
    assert(split.length == 2)
    split.foreach(p => assert(Binary.decodeImage(9L, p).exists(_.width == 20)))
    assert(FfmpegCodec.splitPngStream(Array[Byte](1, 2, 3)).isEmpty)
    val junk = Array.tabulate[Byte](64)(i => i.toByte)
    val frames = FfmpegCodec.decodeFrames(5L, junk, maxFrames = 4)
    assert(frames.length == 4)
    assert(frames.map(_.frame_index) == Seq(0, 1, 2, 3))
    if (!FfmpegCodec.available) {
      // honest default: frame 0 via decode (stub for junk), stub tail
      assert(frames(1).features.sameElements(
        Binary.decodeFrameStub(5L, 1, junk).features))
    } else {
      // REAL path: loop the png into a ~3 s video via ffmpeg itself,
      // then 1-fps sampling must return ≥ 2 real frames at the
      // image's true dimensions with imageio features
      val video = FfmpegCodec.run(
        Seq("-vf", "loop=loop=74:size=1", "-r", "25",
          "-f", "avi", "-vcodec", "mpeg4"), png)
      video.foreach { v =>
        val fs = FfmpegCodec.decodeFrames(6L, v, maxFrames = 5)
        assert(fs.length >= 2, s"expected multi-frame, got ${fs.length}")
        assert(fs.forall(f => f.width == 20 && f.height == 10),
          fs.map(f => (f.width, f.height)).toString)
        assert(!fs(0).features.sameElements(
          Binary.decodeFrameStub(6L, 0, v).features),
          "frame 0 must be a real decode, not the stub")
      }
    }
  }
}

/** Stands in for a codec class shipped in an external jar: no-arg
  * constructor, resolved only by name via [[Codec.load]]. */
class JarShapedCodec extends Codec {
  override def decode(id: Long, payload: Array[Byte]): Binary.DecodedFeatures =
    Binary.DecodedFeatures(id, 7680, 4320, 3, Array.fill(8)(1f))
  override def decodeAudio(id: Long, payload: Array[Byte]): Binary.DecodedAudio =
    Binary.DecodedAudio(id, 48000, 2, 1L, Array.fill(8)(1f))
}

/** Cross-JVM-safe init marker for the codec spec (local mode: tasks
  * share the driver JVM, so a static counter observes task-side init). */
object FakeInitProbe {
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  def mark(): Unit = n.incrementAndGet()
  def reset(): Unit = n.set(0)
  def count(): Int = n.get()
}
