package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing and hash-based near-duplicate pairing —
  * the image-side twin of the text SimHash path. The standard
  * DCT pHash (public algorithm): downsample to 32×32 grayscale, take
  * the 8×8 low-frequency DCT block, threshold each AC coefficient at
  * the median → a 64-bit fingerprint whose hamming distance tracks
  * perceptual similarity (robust to re-encode/resize, unlike a byte
  * md5).
  *
  * Scale shape: hashing is a batched `mapPartitions` decode (the
  * [[Binary]] posture — payload bytes never shuffle; 8-byte hashes
  * do), and pairing reuses the pigeonhole block join from the text
  * SimHash operator: a pair within hamming ≤ k must agree on one of
  * k+1 bit-blocks, so candidates come from equi-joins on (block,
  * bits) — never an all-pairs scan. Non-image payloads (no decodable
  * magic) are dropped, not faked: a video's pHash would be noise.
  */
object Phash {

  /** 64-bit DCT pHash of a decoded image. Deterministic: fixed 32×32
    * nearest-neighbour sample grid, double-precision DCT, median
    * threshold over the 63 AC coefficients (DC excluded — it only
    * encodes global brightness). */
  def phash64(img: java.awt.image.BufferedImage): Long = {
    val n = 32
    val gray = Array.ofDim[Double](n, n)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val px = img.getRGB(math.min(w - 1, x * w / n), math.min(h - 1, y * h / n))
        val pr = (px >> 16) & 0xff; val pg = (px >> 8) & 0xff; val pb = px & 0xff
        gray(y)(x) = 0.299 * pr + 0.587 * pg + 0.114 * pb
        x += 1
      }
      y += 1
    }
    // 8x8 low-frequency block of the 2D DCT-II (naive O(n^2) per
    // coefficient: 64 coefficients x 1024 pixels — trivial per image)
    val coef = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < n) {
          var xx = 0
          while (xx < n) {
            s += gray(yy)(xx) *
              math.cos((2 * xx + 1) * u * math.Pi / (2.0 * n)) *
              math.cos((2 * yy + 1) * v * math.Pi / (2.0 * n))
            xx += 1
          }
          yy += 1
        }
        coef(v)(u) = s
        v += 1
      }
      u += 1
    }
    val ac = (for (i <- 0 until 8; j <- 0 until 8 if i != 0 || j != 0)
      yield coef(i)(j)).toArray
    val median = ac.sorted.apply(ac.length / 2)
    var bits = 0L
    var k = 0
    for (i <- 0 until 8; j <- 0 until 8 if i != 0 || j != 0) {
      if (coef(i)(j) > median) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** (media_id, phash) for every DECODABLE image in a media frame
    * ([[Binary.mediaSchema]] layout). Batched per-partition decode;
    * rows whose payload isn't a decodable image are dropped. */
  def phashMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          if (!Binary.looksLikeImage(payload)) None
          else try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
              .map(img => (id, phash64(img)))
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
      .toDF("media_id", "phash")
  }

  /** Near-duplicate image pairs within hamming distance `maxHamming`
    * over the pHashes — pigeonhole block equi-join, hamming verify
    * (the [[graft.operators.Dedup.simhashPairs]] machinery on image
    * fingerprints). Output: (id_a, id_b, hamming), id_a < id_b. */
  def phashPairs(media: DataFrame, maxHamming: Int = 6,
                 blocks: Int = 8): DataFrame = {
    require(blocks > maxHamming, "pigeonhole requires blocks > maxHamming")
    val fps = phashMedia(media)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keyed = fps.select(col("media_id").as("id"), col("phash"),
        explode(graft.functions.Hashes.simhashBlocks(col("phash"), blocks)).as("bk"))
      .select(col("id"), col("phash"), col("bk.block"), col("bk.bits"))
    val a = keyed.select(col("block"), col("bits"), col("id").as("id_a"),
      col("phash").as("fp_a"))
    val b = keyed.select(col("block"), col("bits"), col("id").as("id_b"),
      col("phash").as("fp_b"))
    val pairs = a.join(b, Seq("block", "bits"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .withColumn("hamming",
        graft.functions.Hashes.hamming64(col("fp_a"), col("fp_b")))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    val cached = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    fps.unpersist(false)
    cached
  }
}
