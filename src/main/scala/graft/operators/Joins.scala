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
  /** Rendezvous (highest-random-weight) shard assignment: each key
    * routes to argmax over shards of hash(shard, key) — the stable
    * alternative to `pmod(hash, n)`: growing the shard list moves
    * ONLY the keys whose new argmax IS the new shard (≈1/(n+1) of
    * them), where mod-n reshuffles nearly everything. The routing
    * layer under incremental stores and sticky writers.
    *
    * Pure per-row expression: |shards| hash evaluations folded with
    * `greatest` over (score, shard) structs — no join, no shuffle, no
    * explode; the shard list rides the plan as literals. Ties (never,
    * with a 60-bit hash) break toward the larger shard name — the
    * struct ordering, mirrored by the oracle. `portableHash` = the
    * md5 gate mode; production keeps codegen'd xxhash64. */
  def rendezvousAssign(df: DataFrame, keyCol: String, shards: Seq[String],
                       portableHash: Boolean = false): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "shards must be non-empty and unique")
    def h(sh: String) = {
      val v = concat(lit(sh), lit(":"), col(keyCol).cast("string"))
      if (portableHash) graft.functions.Hashes.md5Hash64(v)
      else xxhash64(v)
    }
    val scored = shards.map(sh => struct(h(sh).as("s"), lit(sh).as("shard")))
    val best =
      if (scored.size == 1) scored.head else greatest(scored: _*)
    df.withColumn("shard", best.getField("shard"))
  }

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

  /** Salted inner equi-join for SKEWED keys — the join-side companion
    * of [[Sampling.saltedAgg]]: when one key holds a disproportionate
    * share of the probe side AND the build side is too big to
    * broadcast, a plain shuffle join funnels that key's rows through
    * ONE reducer. Salting composites the key: the big side tags each
    * row with a per-row salt in [0, salts) (row-level source, not the
    * key — a hot key must spread by construction), the small side
    * REPLICATES salts× via an inline explode, and the join runs on
    * (key, salt) — the hot key now spans `salts` reducers. The result
    * is row-for-row IDENTICAL to the plain inner join (each big row
    * meets exactly its own salt's replica), which the gate proves
    * against a plain-join oracle. Cost: small side inflates salts× —
    * size it so salts·|small| stays shuffle-cheap. AQE's skew-join
    * handles SORT-merge skew adaptively; explicit salting is the
    * plan-stable form that also covers hash joins and pre-AQE
    * engines. Output: big ⋈ small columns (salt dropped). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
