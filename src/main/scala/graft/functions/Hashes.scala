package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sketch hashes (MinHash, SimHash) as pure Column
  * expressions over Spark's codegen'd xxhash64 — signatures are computed
  * in the scan stage with zero shuffles; only the tiny signatures (not
  * the documents) flow into downstream joins.
  */
object Hashes {

  /** Derive `k` pairwise-independent hash multipliers/offsets from a
    * seed — driver-side, deterministic (no Random: splitmix64 stream). */
  private def splitmix64(seed: Long): Iterator[Long] = {
    var x = seed
    Iterator.continually {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** MinHash signature (array<long> of length k) over an array<string>
    * shingle column. Slot i is min over shingles of xxhash64(slot-salt,
    * shingle) — per-slot salting instead of an affine remix keeps the
    * arithmetic overflow-free under ANSI mode (Spark 4 default).
    *
    * Built as ONE nested-lambda transform over a literal salt array —
    * an array(k × array_min(transform(...))) literal tree made codegen
    * explode (40s of planning/compile for k=64); this form is O(1) tree
    * size for any k. */
  def minhashSignature(shingles: Column, k: Int, seed: Long = 42L): Column = {
    val salts = array(splitmix64(seed).take(k).map(lit(_)).toSeq: _*)
    transform(salts, salt =>
      array_min(transform(shingles, s => xxhash64(salt, s))))
  }

  /** LSH band keys for a MinHash signature: `bands` structs of
    * (band_id, hash-of-rows). Two docs sharing any band key are
    * candidate duplicates. Single nested transform (see above). */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.as("band"),
        xxhash64(concat_ws(",",
          slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))).as("bucket")))

  /** 64-bit SimHash over an array<string> token column: per-bit majority
    * vote of token hashes, weight 1 per token. Hot path — delegates to
    * the codegen kernel (graft.plans.SimHash64); the HOF reference
    * formulation below is kept for the cross-check spec. */
  def simhash64(tokens: Column): Column =
    graft.plans.native.simhash64(tokens)

  /** Interpreted HOF reference of simhash64 (64 lambda evaluations per
    * token) — used only to property-check the kernel. */
  def simhash64Hof(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitVotes(h), (a, v) => a + v))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (cnt, i) => when(cnt > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** +1/-1 votes for each of the 64 bits of a long hash. */
  private def bitVotes(h: Column): Column =
    transform(sequence(lit(0), lit(63)),
      i => when(call_function("shiftrightunsigned", h, i).bitwiseAND(1) === 1, lit(1))
        .otherwise(lit(-1)))

  /** Cross-engine-portable 60-bit integer hash: first 15 hex chars of
    * md5(string form) parsed base-16. DuckDB twin:
    * list_reduce(list_transform(range(1,16), i ->
    *   CAST(strpos('0123456789abcdef', substr(md5(x),i,1))-1 AS BIGINT)),
    *   (a,b) -> a*16+b). Used by the gate queries; production paths keep
    * xxhash64. */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Split a 64-bit simhash into `blocks` equal bit-blocks; fingerprints
    * within hamming distance d < blocks must share at least one block
    * (pigeonhole) — the block keys drive the candidate join. */
  def simhashBlocks(fp: Column, blocks: Int): Column = {
    val width = 64 / blocks
    val mask = (1L << width) - 1
    array((0 until blocks).map { b =>
      struct(lit(b).as("block"),
        shiftrightunsigned(fp, b * width).bitwiseAND(mask).as("bits"))
    }: _*)
  }
}
