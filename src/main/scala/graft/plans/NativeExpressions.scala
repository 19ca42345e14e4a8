package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch/vector hot paths.
  *
  * The higher-order-function formulations (graft.functions.Hashes /
  * Vectors) are correct but evaluate lambdas interpreted, ~µs per
  * element — a k=64 MinHash over a 60-shingle doc costs ~4k lambda
  * evaluations per row. These expressions run the same math as a tight
  * JVM loop invoked from whole-stage codegen (doGenCode emits a single
  * static call), which is the Spark-native answer when built-ins can't
  * express the kernel efficiently.
  */
object MinHashKernel {

  /** splitmix64 stream — deterministic per-slot salts. */
  def salts(k: Int, seed: Long): Array[Long] = {
    val out = new Array[Long](k)
    var x = seed
    var i = 0
    while (i < k) {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out(i) = z ^ (z >>> 31)
      i += 1
    }
    out
  }

  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  def signature(arr: ArrayData, k: Int, seed: Long): ArrayData = {
    val ss = saltCache.computeIfAbsent((k, seed), t => salts(t._1, t._2))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XxHash64Function.hash(s, StringType, 42L)
      var j = 0
      while (j < k) {
        // xorshift64 remix of (base ^ salt): a bijection per slot, so
        // each slot behaves as an independent permutation of shingle
        // hash space — no multiplies, so ANSI overflow checks are moot.
        var z = h ^ ss(j)
        z ^= z << 13; z ^= z >>> 7; z ^= z << 17
        if (z < mins(j)) mins(j) = z
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** MinHash signature of an array<string> shingle column: array<long>
  * of k slot minima. Codegen emits one static kernel call. */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinHashKernel.signature($c, $k, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object VectorKernel {
  /** Cosine similarity with float→double widening per element; all
    * three accumulators fold sequentially (left-to-right) so the result
    * is bit-identical to a sequential reference implementation
    * (DuckDB's list_cosine_similarity over DOUBLE[]). */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** Cosine similarity between two array<float|double> columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects array<float|double>, got $other")
  }
  private lazy val aFloat = elemType(left) == FloatType
  private lazy val bFloat = elemType(right) == FloatType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.plans.VectorKernel.cosine($c1, $c2, $aFloat, $bFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object JaroWinklerKernel {
  /** Jaro–Winkler similarity (Jaro 1989; Winkler 1990): matching
    * window ⌊max(|s|,|t|)/2⌋ − 1, transpositions halved, Winkler
    * prefix boost min(4, common prefix)·0.1·(1 − j) applied only when
    * j > 0.7, and EITHER empty string → 0.0 (including both empty —
    * the DuckDB convention, not the return-1 variant). One flat JVM
    * double pass per pair, called from whole-stage codegen.
    *
    * UNIT: |s| counts Unicode CODE POINTS (round 10) — the same unit
    * Catalyst's `Length` reports, so [[JaroWinklerThresholdRule]]'s
    * length prefilter `min_len ≥ (5τ−4)·max_len` is a sound
    * implication on every input, including supplementary-plane text
    * (a UTF-16-unit kernel under a code-point guard silently dropped
    * matching astral pairs — round-9 advice). The code-point decode
    * is a single linear pre-pass; the match loops are unchanged.
    *
    * DuckDB parity: `jaro_winkler_similarity` iterates BYTES, so the
    * empirically-probed parity holds for ASCII inputs only (where
    * bytes = code units = code points). Gate oracles keep their
    * corpora ASCII; do not assume cross-engine parity on non-ASCII
    * names (round-9 advice, documented here on purpose). */
  def sim(aU: UTF8String, bU: UTF8String): Double = {
    val s = aU.toString.codePoints().toArray
    val t = bU.toString.codePoints().toArray
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = matches.toDouble
    val j = (md / n + md / m + (md - trans / 2.0) / md) / 3.0
    if (j > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(n, m))
      while (p < maxP && s(p) == t(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

/** Jaro–Winkler similarity between two string columns — the
  * record-linkage scorer beside [[LevenshteinWithin]] (edit distance
  * counts operations; JW weighs position and common prefixes, the
  * convention for person/entity names). DuckDB-parity semantics on
  * ASCII input (gate queries replay it with
  * `jaro_winkler_similarity`); on non-ASCII the engines differ by
  * unit — this kernel iterates code points, DuckDB bytes (see
  * [[JaroWinklerKernel.sim]]).
  *
  * `guarded` is [[JaroWinklerThresholdRule]]'s idempotency marker:
  * the rule rewrites threshold predicates over an UNGUARDED node
  * (adding the length prefilter) and flips the flag, so the
  * fixed-point optimizer batch cannot stack prefilters. Evaluation
  * ignores it. */
case class JaroWinklerSim(left: Expression, right: Expression,
                          guarded: Boolean = false)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.plans.JaroWinklerKernel.sim($c1, $c2)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
}

/** md5-derived sketch kernels for the CROSS-ENGINE portable hash mode.
  *
  * The production sketches hash with xxhash64 (fast, codegen'd), which
  * DuckDB cannot reproduce — so the correctness gate runs these md5
  * variants instead: every slot value is an md5 hex string (md5 is
  * bit-identical in every engine), minima/banding/votes are defined on
  * the lexicographic hex ordering, and the whole pipeline — signature,
  * banding, pair verification — becomes exactly expressible in DuckDB
  * SQL. Same algorithm, portable permutations.
  */
object Md5Kernel {
  import java.nio.charset.StandardCharsets.UTF_8
  import org.apache.spark.unsafe.types.UTF8String

  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray

  def md5Hex(s: String): String = {
    val bytes = digests.get().digest(s.getBytes(UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 60-bit mask keeping every value DuckDB-BIGINT-positive. */
  val Mask60: Long = (1L << 60) - 1

  /** Per-slot XOR salts: splitmix64 stream masked to 60 bits —
    * regenerated identically inside the oracle SQL as literals. */
  def salts(k: Int, seed: Long): Array[Long] =
    MinHashKernel.salts(k, seed).map(_ & Mask60)

  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  /** First 15 hex chars of md5(s) parsed base-16 — the same value as
    * Hashes.md5Hash64 / its DuckDB list_reduce twin. */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val d = digests.get().digest(bytes)
    // 15 hex chars = first 7 bytes + the high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Slot j = min over shingles of (md5hash60(s) XOR salt_j): ONE
    * digest per shingle, k xors — the DuckDB twin is
    * MIN(xor(h, salt_j)) over the same salt literals. An EMPTY shingle
    * array yields the all-Long.MaxValue sentinel — callers must
    * exclude shingle-less docs before banding (Dedup.minhashLshPairs
    * does), or every pair of empty docs bands identically. */
  def signature(arr: ArrayData, k: Int, seed: Long): ArrayData = {
    val ss = saltCache.computeIfAbsent((k, seed), t => salts(t._1, t._2))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = md5Hash60(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val v = h ^ ss(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash as a 16-hex-char string. Token hash = first 16 hex
    * chars of md5(token); bit b (MSB-first) read from nibble b/4; strict
    * majority (>0) sets the bit. Empty token array → all-zero hash. */
  def simhash(arr: ArrayData): UTF8String = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val hx = md5Hex(arr.getUTF8String(i).toString)
      var b = 0
      while (b < 64) {
        val nib = Character.digit(hx.charAt(b / 4), 16)
        val bit = (nib >> (3 - b % 4)) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    val out = new Array[Char](16)
    var c = 0
    while (c < 16) {
      var nib = 0
      var r = 0
      while (r < 4) {
        if (votes(4 * c + r) > 0) nib |= (8 >> r)
        r += 1
      }
      out(c) = HEX(nib)
      c += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Portable MinHash signature: array<long> of k (md5hash60 ^ salt_j)
  * slot minima — one digest per shingle. */
case class Md5MinHashSig(child: Expression, k: Int, seed: Long = 42L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_minhash_sig expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_sig"
  override def nullSafeEval(input: Any): Any =
    Md5Kernel.signature(input.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Kernel.signature($c, $k, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
}

/** Portable SimHash fingerprint: 16-hex-char string over array<string>. */
case class Md5SimHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash expects array<string>, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_simhash"
  override def nullSafeEval(input: Any): Any =
    Md5Kernel.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Kernel.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5SimHash =
    copy(child = newChild)
}

object SimHash64Kernel {
  /** 64-bit SimHash over token xxhash64 values — bit-for-bit the HOF
    * formulation in graft.functions.Hashes.simhash64Hof (PropertySpec
    * asserts equality), as a single tight loop per row. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Production SimHash fingerprint of an array<string> token column. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    SimHash64Kernel.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64Kernel.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object NearestCellKernel {
  /** Argmax over the centroid set of cosine(vec, centroid). Cosine is
    * the same sequential fold as VectorKernel.cosine (bit-stable vs
    * DuckDB's list_cosine_similarity); ties break toward the larger
    * cell id, matching the previous max(struct(sim, cell)) semantics. */
  def nearest(vec: ArrayData, vecFloat: Boolean,
              cells: Array[Long], cents: Array[Array[Double]]): Long = {
    val n = vec.numElements()
    var bestCell = 0L
    var bestSim = Double.NegativeInfinity
    var first = true
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = cent(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      if (first || sim > bestSim || (sim == bestSim && cells(c) > bestCell)) {
        bestSim = sim; bestCell = cells(c); first = false
      }
      c += 1
    }
    bestCell
  }
}

object NearestCellsKernel {
  /** Top-`k` cells by (cosine DESC, cell id DESC) — the bounded-heap
    * probe ranking for [[graft.operators.Knn.knnGraph]] (round 11,
    * replacing the per-row O(c log c) struct-sort + reverse + slice:
    * the r10 verdict watch item for targetCellSize-driven large c).
    * Selection is an insertion into k sorted slots — O(c·k) with k the
    * tiny nprobe (2–8), no per-row struct array allocation, and the
    * SAME tie order as the old max(struct(sim, cell)) formulation, so
    * every gate oracle replays unchanged. */
  def nearestK(vec: ArrayData, vecFloat: Boolean, cells: Array[Long],
               cents: Array[Array[Double]], k: Int): ArrayData = {
    val n = vec.numElements()
    val kk = math.min(k, cents.length)
    val simBest = new Array[Double](kk)
    val cellBest = new Array[Long](kk)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = cent(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      val cell = cells(c)
      // insertion position: before the first slot this candidate BEATS
      // under (sim DESC, cell DESC)
      var j = filled
      while (j > 0 && (sim > simBest(j - 1) ||
        (sim == simBest(j - 1) && cell > cellBest(j - 1)))) j -= 1
      if (j < kk) {
        val last = math.min(filled, kk - 1)
        var t = last
        while (t > j) {
          simBest(t) = simBest(t - 1); cellBest(t) = cellBest(t - 1)
          t -= 1
        }
        simBest(j) = sim; cellBest(j) = cell
        if (filled < kk) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = cellBest(o); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Top-nprobe nearest-centroid cell ids (array<long>, best first) —
  * the multi-probe sibling of [[NearestCell]], same no-join/no-shuffle
  * posture; see [[NearestCellsKernel.nearestK]]. */
case class NearestCells(child: Expression, cells: Array[Long],
                        cents: Array[Array[Double]], k: Int)
    extends UnaryExpression {
  require(cells.length == cents.length && cells.nonEmpty && k >= 1,
    "cells/centroids must be non-empty and aligned, k >= 1")
  private lazy val vecFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any =
    NearestCellsKernel.nearestK(input.asInstanceOf[ArrayData], vecFloat,
      cells, cents, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NearestCellsKernel.nearestK($c, $vecFloat, $cellsRef, $centsRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/** Nearest-centroid cell id for an array<float|double> vector column.
  * The centroid set rides along as a reference object into generated
  * code — assignment is a per-row expression with NO join and NO
  * shuffle, which is what keeps IVF viable when the corpus is 100 TB:
  * the only data movement is the broadcast of the (metadata-scale)
  * centroid array inside the serialized expression tree. */
case class NearestCell(child: Expression, cells: Array[Long],
                       cents: Array[Array[Double]]) extends UnaryExpression {
  require(cells.length == cents.length && cells.nonEmpty,
    "cells/centroids must be non-empty and aligned")
  private lazy val vecFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<float|double>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(input: Any): Any =
    NearestCellKernel.nearest(input.asInstanceOf[ArrayData], vecFloat, cells, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NearestCellKernel.nearest($c, $vecFloat, $cellsRef, $centsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object PqKernel {
  /** Argmin-L2 codeword id per subspace — semantically identical to
    * the HOF formulation in Pq.codesColumnHof: distances are the same
    * sequential fold (bit-stable vs the DuckDB oracle replay), ties
    * break toward the FIRST minimum (array_position-of-array_min). */
  def codes(vec: ArrayData, vecFloat: Boolean,
            books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cws = books(s)
      val subDim = cws(0).length
      val off = s * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (vecFloat) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val diff = x - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Two-level residual codes: per subspace, level-1 argmin code then
    * argmin over the level-2 codebook for the RESIDUAL sub − cw1.
    * Output interleaves [c1_0, c2_0, c1_1, c2_1, …] (length 2m), which
    * makes `adcScore` work unchanged with interleaved dot tables:
    * score = Σ_s q·cw1[c1_s] + q·cw2[c2_s] = q·(cw1+cw2) — the
    * reconstruction's dot, one extra byte-ish per subspace for a
    * strictly finer quantization. */
  def residualCodes(vec: ArrayData, vecFloat: Boolean,
                    books1: Array[Array[Array[Double]]],
                    books2: Array[Array[Array[Double]]]): ArrayData = {
    val m = books1.length
    val out = new Array[Any](2 * m)
    var s = 0
    while (s < m) {
      val cws1 = books1(s)
      val subDim = cws1(0).length
      val off = s * subDim
      // level 1: argmin over codewords
      var best1 = 0; var bestD1 = Double.PositiveInfinity
      var c = 0
      while (c < cws1.length) {
        val cw = cws1(c)
        var d = 0.0; var i = 0
        while (i < subDim) {
          val x = if (vecFloat) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val diff = x - cw(i); d += diff * diff; i += 1
        }
        if (d < bestD1) { bestD1 = d; best1 = c }
        c += 1
      }
      // level 2: argmin over the residual
      val cw1 = cws1(best1)
      val cws2 = books2(s)
      var best2 = 0; var bestD2 = Double.PositiveInfinity
      c = 0
      while (c < cws2.length) {
        val cw2 = cws2(c)
        var d = 0.0; var i = 0
        while (i < subDim) {
          val x = if (vecFloat) vec.getFloat(off + i).toDouble
                  else vec.getDouble(off + i)
          val diff = (x - cw1(i)) - cw2(i); d += diff * diff; i += 1
        }
        if (d < bestD2) { bestD2 = d; best2 = c }
        c += 1
      }
      out(2 * s) = best1
      out(2 * s + 1) = best2
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_s tables[s][codes[s]] — the same left fold as the
    * HOF aggregate-over-sequence form, so scores are bit-identical. */
  def adcScore(codes: ArrayData, tables: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += tables.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }
}

/** PQ codes for an array<float|double> vector column: array<int> of m
  * argmin-L2 codeword ids. The codebooks ride into generated code as a
  * reference object (same broadcast-inside-the-expression shape as
  * NearestCell) — encoding is a per-row expression with no join and no
  * shuffle, the index-build hot loop at corpus scale. */
case class PqCodes(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty), "empty codebooks")
  private lazy val vecFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes expects array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(input: Any): Any =
    PqKernel.codes(input.asInstanceOf[ArrayData], vecFloat, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("books", books, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqKernel.codes($c, $vecFloat, $booksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object HyperplaneKernel {
  /** Random-hyperplane LSH bucket: bit p = sign(vec · planes[p]), as a
    * packed long. Each dot is the same sequential fold as Vectors.dot
    * (and the oracle's seqDotSql), so buckets replay bit-identically. */
  def bucket(vec: ArrayData, vecFloat: Boolean,
             planes: Array[Array[Double]]): Long = {
    var b = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val m = math.min(vec.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      if (dot >= 0) b |= (1L << p)
      p += 1
    }
    b
  }

  /** Multi-probe bucket list (Lv et al., VLDB 2007 — query-directed
    * multi-probe LSH; public algorithm): element 0 is the exact
    * bucket, elements 1..nProbes flip the bit of the nProbes planes
    * with the SMALLEST |dot| (the least-confident sides — the
    * perturbations most likely to recover a near neighbor that landed
    * across a close hyperplane), ties to the lower plane index. Dots
    * are the same sequential fold as [[bucket]] (and the oracle's
    * seqDotSql), so probe selection replays bit-identically. */
  def probes(vec: ArrayData, vecFloat: Boolean,
             planes: Array[Array[Double]], nProbes: Int): ArrayData = {
    val np = planes.length
    val dots = new Array[Double](np)
    var b = 0L
    var p = 0
    while (p < np) {
      val plane = planes(p)
      val m = math.min(vec.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        dot += x * plane(i)
        i += 1
      }
      dots(p) = dot
      if (dot >= 0) b |= (1L << p)
      p += 1
    }
    val order = Array.range(0, np)
      .sortBy(p => (math.abs(dots(p)), p))
    val out = new Array[Long](nProbes + 1)
    out(0) = b
    var j = 0
    while (j < nProbes) {
      out(j + 1) = b ^ (1L << order(j))
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Multi-probe hyperplane-LSH bucket list for a vector column: the
  * exact bucket plus `nProbes` one-bit perturbations of the
  * least-confident planes (see HyperplaneKernel.probes). One kernel
  * call replaces `planes` dot HOFs + a per-row sort. */
case class HyperplaneProbes(child: Expression, planes: Array[Array[Double]],
                            nProbes: Int)
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 63, "need 1..63 planes")
  require(nProbes >= 0 && nProbes <= planes.length,
    s"need 0 <= nProbes <= planes, got $nProbes")
  private lazy val vecFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_probes expects array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_probes"

  override def nullSafeEval(input: Any): Any =
    HyperplaneKernel.probes(input.asInstanceOf[ArrayData], vecFloat, planes,
      nProbes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HyperplaneKernel.probes($c, $vecFloat, $planesRef, $nProbes)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneProbes =
    copy(child = newChild)
}

/** Packed hyperplane-LSH bucket id for an array<float|double> vector
  * column; the plane matrix rides into generated code as a reference
  * object. Replaces `planes` interpreted dot-product HOFs per row in
  * the embedding-dedup bucketing pass. */
case class HyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 63, "need 1..63 planes")
  private lazy val vecFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float|double>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any =
    HyperplaneKernel.bucket(input.asInstanceOf[ArrayData], vecFloat, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HyperplaneKernel.bucket($c, $vecFloat, $planesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** Two-level residual-PQ codes (see PqKernel.residualCodes): interleaved
  * array<int> of length 2m; both codebook levels ride as reference
  * objects. */
case class ResidualCodes(child: Expression,
                         books1: Array[Array[Array[Double]]],
                         books2: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(books1.nonEmpty && books1.length == books2.length,
    "books1/books2 must be non-empty and aligned per subspace")
  private lazy val vecFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"residual_codes expects array<float|double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "residual_codes"

  override def nullSafeEval(input: Any): Any =
    PqKernel.residualCodes(input.asInstanceOf[ArrayData], vecFloat, books1, books2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b1 = ctx.addReferenceObj("books1", books1, "double[][][]")
    val b2 = ctx.addReferenceObj("books2", books2, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqKernel.residualCodes($c, $vecFloat, $b1, $b2)")
  }

  override protected def withNewChildInternal(newChild: Expression): ResidualCodes =
    copy(child = newChild)
}

/** ADC table-lookup score of (codes: array<int>, tables:
  * array<array<double>>) — the per-candidate inner loop of PQ search,
  * codegen'd instead of an interpreted aggregate-over-sequence. */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_score expects (array<int>, array<array<double>>), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def nullSafeEval(codes: Any, tables: Any): Any =
    PqKernel.adcScore(codes.asInstanceOf[ArrayData], tables.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.plans.PqKernel.adcScore($c, $t)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object ShingleKernel {
  /** Word n-gram shingles of normalized text — byte-for-byte the same
    * output as Text.wordShingles(Text.normalizeText(c), n): lowercase,
    * split on \s+, drop empties; docs shorter than n words yield one
    * whole-text shingle. */
  def shingles(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val out: Array[Any] =
      if (toks.length < n) Array(org.apache.spark.unsafe.types.UTF8String.fromString(toks.mkString(" ")))
      else {
        val arr = new Array[Any](toks.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
          i += 1
        }
        arr
      }
    new GenericArrayData(out)
  }
}

/** Word n-gram shingles of a string column (normalizing internally). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingles(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Membership probe against a pre-built Bloom filter (org.apache.spark
  * .util.sketch.BloomFilter — the same sketch `df.stat.bloomFilter`
  * builds distributed). The filter rides the plan as a reference
  * object (broadcast with the task closures, fixed RAM regardless of
  * needle count); probing is a codegen'd per-row call — no join, no
  * shuffle. False positives at the filter's fpp; never false
  * negatives. */
case class BloomContains(child: Expression,
                         bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects string, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$bloomRef.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BpeKernel {
  private val SEP = "\\u001f"

  /** GPT-2's bytes_to_unicode bijection (Radford et al. 2019,
    * public `encoder.py`): printable/latin bytes map to themselves
    * (33–126, 161–172, 174–255); the rest — controls, space, DEL,
    * NBSP block, soft hyphen — map to 256+n in byte order, so every
    * byte gets a VISIBLE single code point and merges operate on
    * plain strings with no escaping. The byte-level BPE alphabet is
    * therefore exactly 256 symbols and any UTF-8 input tokenizes
    * without an OOV path — the property production tokenizers ship
    * byte-level for. */
  lazy val byteToUnicode: Map[Int, String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = -1
    (0 until 256).map { b =>
      val cp = if (keep(b)) b else { n += 1; 256 + n }
      b -> new String(Character.toChars(cp))
    }.toMap
  }

  private lazy val byteSym: Array[String] =
    Array.tabulate(256)(byteToUnicode)

  /** Merge table → rank map keyed "a␟b" (rank = merge priority,
    * 0 = learned first). */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      if (!m.containsKey(a + SEP + b)) m.put(a + SEP + b, Int.box(i))
    }
    m
  }

  /** Greedy BPE encode of one document: lowercase, split on
    * whitespace, then per word repeatedly merge the LOWEST-RANK
    * adjacent symbol pair present (all leftmost non-overlapping
    * occurrences per sweep) until no learnable pair remains — Sennrich
    * 2016's apply_bpe loop. O(word·merges-applied) per word, vocab
    * size irrelevant to per-row cost. `byteLevel` starts each word
    * from its UTF-8 bytes remapped through [[byteToUnicode]] instead
    * of its characters (GPT-2 form — multibyte chars decompose, no
    * OOV possible). */
  def encode(text: org.apache.spark.unsafe.types.UTF8String,
             ranks: java.util.HashMap[String, Integer],
             byteLevel: Boolean): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val out = new scala.collection.mutable.ArrayBuffer[Any](toks.length * 2)
    var t = 0
    while (t < toks.length) {
      val word = toks(t)
      val syms: Array[String] =
        if (byteLevel) {
          val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Array.tabulate(bs.length)(i => byteSym(bs(i) & 0xff))
        } else
          Array.tabulate(word.length)(i => String.valueOf(word.charAt(i)))
      var len = syms.length
      var done = len < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var bestA: String = null
        var bestB: String = null
        var i = 0
        while (i < len - 1) {
          val r = ranks.get(syms(i) + SEP + syms(i + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
          }
          i += 1
        }
        if (bestA == null) done = true
        else {
          var w = 0
          i = 0
          while (i < len) {
            if (i < len - 1 && syms(i) == bestA && syms(i + 1) == bestB) {
              syms(w) = bestA + bestB; i += 2
            } else { syms(w) = syms(i); i += 1 }
            w += 1
          }
          len = w
          done = len < 2
        }
      }
      var k = 0
      while (k < len) {
        out += org.apache.spark.unsafe.types.UTF8String.fromString(syms(k))
        k += 1
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Production BPE tokenization with a learned merge table: the greedy
  * lowest-rank-pair loop instead of [[graft.operators.Bpe.encodeColumn]]'s
  * one codegen'd replace per VOCAB ENTRY — a 30k-merge production
  * vocabulary costs a map lookup per adjacent pair, not 30k string
  * scans per word (and no 64KB-method codegen blowup). The rank map
  * rides the plan as ONE reference object, shipped per task with the
  * closures — per-row work is shuffle-free and scan-shaped.
  *
  * Output is IDENTICAL to encodeColumn for any rank-consistent merge
  * list — and every trained list is consistent: a pair involving a
  * merged symbol can only be learned AFTER the merge that created the
  * symbol, so applying pairs in rank order never misses a lower-rank
  * pair created by a higher-rank merge (property-spec'd in BpeSpec). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)],
                     byteLevel: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  @transient private lazy val ranks = BpeKernel.rankMap(merges)

  override def nullSafeEval(input: Any): Any =
    BpeKernel.encode(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ranks,
      byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("ranks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.BpeKernel.encode($c, $ranksRef, $byteLevel)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object UnicodeKernel {
  /** Unicode NFC via the JDK normalizer; pure per-row, no state. */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.NFC))
}

/** Unicode NFC normalization — the first cleaning step on scraped
  * text, where the same glyph arrives precomposed ("é" U+00E9) or
  * decomposed ("e" + U+0301) and every downstream exact-hash
  * operation (fingerprints, shingles, exact dedup keys) silently
  * treats them as different documents. Scan-shaped codegen call into
  * the JDK normalizer (Unicode NFC is an engine-portable spec —
  * DuckDB's nfc_normalize replays it, the q111 gate bridge). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeKernel.nfc(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object IntersectKernel {
  import org.apache.spark.unsafe.types.UTF8String
  /** |distinct(A) ∩ distinct(B)| of two ASCENDING-sorted string arrays
    * by a single merge pass — the exact-verify inner loop of the
    * set-similarity joins, and exactly `size(array_intersect(a, b))`
    * for sorted arrays (array_intersect dedupes — the merge skips
    * equal-runs so duplicates count once — and null elements, sorted
    * FIRST per sort_array-ascending's ordering, intersect as one
    * shared element when present on both sides). O(|A|+|B|)
    * comparisons, zero allocation, vs the interpreted
    * `array_intersect` + `size` tree it replaces. Inputs must be
    * sorted with Spark's string ordering (binary UTF-8 — what
    * `sort_array` / `array_sort` produce). */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    // In ANY sorted array nulls form one contiguous run at an END —
    // `sort_array(_, asc)` puts them FIRST, `array_sort` LAST — so
    // null-presence is an O(1) endpoint check, and array_intersect's
    // "null equals null, deduped" rule is one shared element when
    // both sides carry one. The merge below skips null slots wherever
    // they sit, so both producers are safe (round-8: the old loop
    // only skipped LEADING nulls and NPE'd on array_sort input).
    val nullA = na > 0 && (a.isNullAt(0) || a.isNullAt(na - 1))
    val nullB = nb > 0 && (b.isNullAt(0) || b.isNullAt(nb - 1))
    var i = 0
    var j = 0
    var n = if (nullA && nullB) 1L else 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val sa = a.getUTF8String(i)
        val sb = b.getUTF8String(j)
        val c = sa.compareTo(sb)
        if (c == 0) {
          n += 1
          // skip the equal-run on both sides: duplicates count once
          i += 1; j += 1
          while (i < na && !a.isNullAt(i) &&
            a.getUTF8String(i).compareTo(sa) == 0) i += 1
          while (j < nb && !b.isNullAt(j) &&
            b.getUTF8String(j).compareTo(sb) == 0) j += 1
        }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }
}

/** Bounded-buffer collect with an OVERFLOW-TO-NULL contract:
  * `capped_collect_list(e, cap)` returns the collected array when the
  * group has ≤ cap elements and NULL once it exceeds the cap — the
  * viral-key guard of the set-similarity family expressed as a single
  * aggregate. The former shape paid a second corpus scan (keys-only
  * df counts) plus a broadcast anti-join to drop hot keys BEFORE the
  * posting-list shuffle; this buffer simply stops growing at cap+1
  * elements (update, and merge of partials, both truncate — a
  * truncated partial already proves the group exceeds the cap, so
  * the flag survives merging exactly), which bounds every partial
  * and final buffer at cap+1 elements REGARDLESS of key virality: a
  * shingle appearing in every document of a 100 TB corpus costs each
  * aggregation task at most cap+1 buffered elements, then evaluates
  * to NULL and is filtered. One corpus exchange, no funnel hazard,
  * no re-scan. Distinct from approx/sampling caps: groups at or
  * under the cap collect EXACTLY (order normalized by the caller's
  * sort_array), so downstream semantics are identical to the
  * count-then-anti-join form the oracles replay. */
case class CappedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.Collect[
    scala.collection.mutable.ArrayBuffer[Any]] {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Any] =
    scala.collection.mutable.ArrayBuffer.empty

  override def convertToBufferElement(value: Any): Any =
    org.apache.spark.sql.catalyst.InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def children: Seq[Expression] = child :: Nil

  override def nullable: Boolean = true

  override def prettyName: String = "capped_collect_list"

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Any],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : scala.collection.mutable.ArrayBuffer[Any] =
    if (buffer.length > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: scala.collection.mutable.ArrayBuffer[Any],
      other: scala.collection.mutable.ArrayBuffer[Any])
      : scala.collection.mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(
      buffer: scala.collection.mutable.ArrayBuffer[Any]): Any =
    if (buffer.length > cap) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buffer.toArray)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectList =
    copy(child = newChildren.head)
}

object LevenshteinKernel {
  import org.apache.spark.unsafe.types.UTF8String
  /** Thresholded edit distance with COMMON PREFIX/SUFFIX TRIMMING:
    * returns lev(a, b) when ≤ k, else −1 — exactly
    * `UTF8String.levenshteinDistance(other, k)`, to which the
    * post-trim remainder is delegated (so unit-of-edit semantics are
    * Spark's own, bit-for-bit). The trim is the identity
    * lev(p·x·s, p·y·s) = lev(x, y): near-duplicate corpora — the only
    * place an edit-distance verify runs hot — share long prefixes by
    * construction (blocking keys ARE prefixes in the common case), so
    * the O(k·min) band usually collapses to a few residual chars.
    * Byte-level trim with codepoint-boundary backoff: bytes before
    * the split are identical in both strings, so boundary structure
    * is shared and the backoff loop is safe on multibyte input.
    * Measured on the q141 linkage gate (18-char names, 16-char shared
    * block prefix): ~4× over the untrimmed banded kernel. */
  def dist(a: UTF8String, b: UTF8String, k: Int): Int = {
    val na = a.numBytes(); val nb = b.numBytes()
    var p = 0
    while (p < na && p < nb && a.getByte(p) == b.getByte(p)) p += 1
    while (p > 0 && ((p < na && (a.getByte(p) & 0xC0) == 0x80) ||
      (p < nb && (b.getByte(p) & 0xC0) == 0x80))) p -= 1
    var sa = na; var sb = nb
    while (sa > p && sb > p && a.getByte(sa - 1) == b.getByte(sb - 1)) {
      sa -= 1; sb -= 1
    }
    while (sa < na && (a.getByte(sa) & 0xC0) == 0x80) { sa += 1; sb += 1 }
    val ta = UTF8String.fromAddress(a.getBaseObject, a.getBaseOffset + p, sa - p)
    val tb = UTF8String.fromAddress(b.getBaseObject, b.getBaseOffset + p, sb - p)
    ta.levenshteinDistance(tb, k)
  }
}

/** Trimmed thresholded edit distance — codegen'd
  * `levenshtein_within(a, b, k)`: lev(a, b) when ≤ k else −1, via
  * [[LevenshteinKernel]] (common-affix trim + Spark's banded DP).
  * The verify kernel of [[graft.operators.Dedup.linkRecords]] and the
  * rewrite target of [[LevenshteinThresholdRule]]. */
case class LevenshteinWithin(left: Expression, right: Expression,
                             threshold: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"levenshtein_within expects (string, string), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_within"

  override def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinKernel.dist(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.LevenshteinKernel.dist($a, $b, $threshold)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinWithin =
    copy(left = newLeft, right = newRight)
}

/** Merge-count of common elements of two sorted distinct string
  * arrays — codegen'd replacement for size(array_intersect(a, b)) in
  * the exact-verify step of the set-similarity joins. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<string>, array<string>), got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.IntersectKernel.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object native {
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(GraftBridge.expression(a),
      GraftBridge.expression(b)))

  def levenshteinWithin(a: Column, b: Column, k: Int): Column =
    GraftBridge.column(LevenshteinWithin(GraftBridge.expression(a),
      GraftBridge.expression(b), k))

  def jaroWinkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinklerSim(GraftBridge.expression(a),
      GraftBridge.expression(b)))

  def cappedCollectList(e: Column, cap: Int): Column =
    GraftBridge.column(CappedCollectList(GraftBridge.expression(e), cap)
      .toAggregateExpression())

  def nfcNormalize(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))

  def bpeTokens(text: Column, merges: Seq[(String, String)],
                byteLevel: Boolean = false): Column =
    GraftBridge.column(BpeTokens(GraftBridge.expression(text), merges,
      byteLevel))

  def wordShingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))

  def bloomContains(text: Column,
                    bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    GraftBridge.column(BloomContains(GraftBridge.expression(text), bloom))

  /** Column wrappers for the native expressions. */
  def minhashSig(shingles: Column, k: Int, seed: Long = 42L): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingles), k, seed))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  def nearestCells(vec: Column, cells: Array[Long],
                   cents: Array[Array[Double]], k: Int): Column =
    GraftBridge.column(NearestCells(GraftBridge.expression(vec), cells,
      cents, k))

  def nearestCell(vec: Column, cells: Array[Long],
                  cents: Array[Array[Double]]): Column =
    GraftBridge.column(NearestCell(GraftBridge.expression(vec), cells, cents))

  def pqCodes(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(PqCodes(GraftBridge.expression(vec), books))

  def hyperplaneBucket(vec: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(HyperplaneBucket(GraftBridge.expression(vec), planes))

  def hyperplaneProbes(vec: Column, planes: Array[Array[Double]],
                       nProbes: Int): Column =
    GraftBridge.column(HyperplaneProbes(GraftBridge.expression(vec), planes,
      nProbes))

  def residualCodes(vec: Column, books1: Array[Array[Array[Double]]],
                    books2: Array[Array[Array[Double]]]): Column =
    GraftBridge.column(ResidualCodes(GraftBridge.expression(vec), books1, books2))

  def adcScore(codes: Column, tables: Column): Column =
    GraftBridge.column(AdcScore(GraftBridge.expression(codes),
      GraftBridge.expression(tables)))

  def md5MinhashSig(shingles: Column, k: Int): Column =
    GraftBridge.column(Md5MinHashSig(GraftBridge.expression(shingles), k))

  def md5Simhash(tokens: Column): Column =
    GraftBridge.column(Md5SimHash(GraftBridge.expression(tokens)))

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}
