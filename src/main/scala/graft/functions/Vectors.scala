package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>`/`array<double>` embedding
  * columns, expressed with Spark's higher-order functions (zip_with /
  * aggregate) so they compile to codegen'd expressions — no UDF
  * serialization on the 100 TB path.
  */
object Vectors {

  /** Dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. Hot path
    * — delegates to the native codegen kernel (graft.plans.CosineSim),
    * which folds identically to the HOF formulation but ~30× faster. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.native.cosineSim(a, b)

  /** HOF reference formulation of cosine (kept for cross-checking the
    * native kernel in tests). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** L2-normalize a vector (zero vector unchanged). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a)
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Signed random-hyperplane sketch bit: sign(v · h) for a hyperplane
    * generated deterministically from `seed` on the driver. Used by the
    * embedding-LSH dedup path. typedLit keeps the hyperplane a single
    * Literal node — a lit()-per-element tree made Catalyst analysis
    * scale with planes×dim. */
  def hyperplaneBit(v: Column, hyperplane: Seq[Double]): Column =
    (dot(v, typedLit(hyperplane)) >= 0).cast("int")

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions:
    * y_j = (v · g_j) / sqrt(outDim) with seeded gaussian rows g_j —
    * pairwise distances preserved in expectation (JL lemma), which
    * makes it the standard cheap pre-step before LSH/clustering/ANN
    * on wide embeddings (projection cost dim×outDim mults per row, a
    * pure per-row expression — no shuffle, no UDF). Deterministic for
    * a given seed: the matrix regenerates identically on the driver
    * and inlines as literals (broadcast-in-plan); each output dim is
    * the ordered fold the oracles replay (seqDotSql shape). */
  def randomProjection(v: Column, dim: Int, outDim: Int,
                       seed: Long = 7L): Column = {
    require(dim > 0 && outDim > 0)
    val rnd = new scala.util.Random(seed)
    val rows = Seq.fill(outDim)(Seq.fill(dim)(rnd.nextGaussian()))
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    array(rows.map { row =>
      aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, d) =>
        acc + element_at(v, d).cast("double") *
          element_at(typedLit(row), d)) * lit(scale)
    }: _*)
  }

  /** The projection matrix [[randomProjection]] draws for (dim,
    * outDim, seed) — exposed so gate oracles can inline the identical
    * literals. */
  def projectionMatrix(dim: Int, outDim: Int,
                       seed: Long = 7L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(outDim)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
