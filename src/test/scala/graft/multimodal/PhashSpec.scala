package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class PhashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic image: a smooth gradient keyed by `seed`
    * (pHash needs structure — random noise hashes uselessly). */
  private def gradientPng(seed: Int, w: Int = 64, h: Int = 64,
                          tweak: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / w + seed * 37) % 256
      val g = (y * 255 / h + seed * 91) % 256
      val b = ((x + y) * 255 / (w + h) + seed * 13) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    if (tweak) img.setRGB(1, 1, 0xffffff) // single-pixel change
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("phash64: identical and near-identical images collide; different ones do not") {
    def hash(bytes: Array[Byte]) =
      Phash.phash64(ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    val a = hash(gradientPng(1))
    val aTweak = hash(gradientPng(1, tweak = true))
    val rescaled = hash(gradientPng(1, w = 32, h = 32)) // same scene, re-sampled
    val other = hash(gradientPng(9))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, aTweak) <= 4, s"tweak moved ${ham(a, aTweak)} bits")
    assert(ham(a, rescaled) <= 10, s"rescale moved ${ham(a, rescaled)} bits")
    assert(ham(a, other) >= 16, s"different scene only ${ham(a, other)} bits apart")
  }

  test("phashPairs finds near-dup images via the pigeonhole join; non-images drop") {
    val media = Seq(
      (1L, gradientPng(1)),
      (2L, gradientPng(1, tweak = true)),       // near-dup of 1
      (3L, gradientPng(9)),                     // different scene
      (4L, "not an image".getBytes("UTF-8")),   // undecodable: dropped
      (5L, gradientPng(9, w = 48, h = 48)))     // near-dup of 3 (rescale)
      .toDF("media_id", "payload")
    val hashed = Phash.phashMedia(media).as[(Long, Long)].collect.toMap
    assert(hashed.keySet == Set(1L, 2L, 3L, 5L))
    val pairs = Phash.phashPairs(media, maxHamming = 10, blocks = 16)
      .as[(Long, Long, Long)].collect.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 5L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
