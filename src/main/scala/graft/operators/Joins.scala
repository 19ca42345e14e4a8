package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side reduction operators: the hand-rolled runtime filter.
  * A fact-to-dimension semi-join at 100 TB pays for shuffling every
  * fact row — including the vast majority that match nothing. Spark's
  * own runtime row-group filtering only kicks in for some shapes;
  * this makes the technique explicit and plan-visible.
  */
object Joins {

  /** Semi-join `big` to `dim` with a Bloom pre-filter: the dim keys
    * fold into the [[TextAnalytics.bloomBuild]] portable Bloom
    * (metadata-scale, rides the plan as ONE array literal), every big
    * row probes it IN THE SCAN (a pure projection — no join, no
    * shuffle), and only probable matches reach the exact semi-join.
    * The final join makes the result EXACTLY the plain semi-join —
    * Bloom false positives are killed there; false negatives don't
    * exist — while the shuffle carries ~selectivity + fpp of the fact
    * table instead of all of it.
    *
    * Keys are cast to string on BOTH sides before hashing, so any
    * key type probes consistently. The dense literal form holds to
    * ~2^30 bits (see [[TextAnalytics.bloomWords]]); size via
    * `bitsPerKey` (default 16 ≈ 0.05% fp with k=5). For dimensions
    * too big for that, a Bloom no longer beats just semi-joining. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    dim: DataFrame, dimKey: String,
                    bitsPerKey: Int = 16): DataFrame = {
    require(bitsPerKey >= 1, "bitsPerKey must be >= 1")
    val nDim = dim.select(col(dimKey)).where(col(dimKey).isNotNull).count()
    if (nDim == 0) return big.limit(0)
    val rawBits = math.max(64L, nDim * bitsPerKey.toLong)
    require(rawBits <= (1L << 30),
      s"dimension too large for a driver-literal Bloom ($rawBits bits); semi-join directly")
    val mBits = (((rawBits + 63) / 64) * 64).toInt
    val k = 5
    // xxhash64 mode: the exact join below makes the result
    // hash-independent, so nothing needs the replayable md5 chain —
    // and the probe stays a one-instruction hash in codegen.
    val words = TextAnalytics.bloomWords(
      TextAnalytics.bloomBuild(
        dim.select(col(dimKey).cast("string").as("v")), "v", mBits, k,
        portableHash = false),
      mBits)
    big
      .where(TextAnalytics.bloomMightContain(
        col(bigKey).cast("string"), words, mBits, k, portableHash = false))
      .join(dim.select(col(dimKey).cast(big.schema(bigKey).dataType).as(bigKey))
        .distinct(), Seq(bigKey), "left_semi")
  }
}
