package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding second-moment (Gram) aggregation and the PCA utilities
  * that ride on it — the whitening / top-component-removal step of an
  * embedding curation pipeline (common-component removal is the
  * standard fix for anisotropic sentence embeddings).
  *
  * The 100 TB shape: the corpus is reduced to a d×(d+1)/2-cell exact
  * integer Gram matrix in ONE pass (map-side partial aggregation —
  * only 4 KB-scale cell buffers cross the wire), and every float step
  * (eigenvector iteration) runs DRIVER-side on that d×d summary in a
  * fixed operation order. Nothing row-scale is ever collected.
  */
object Pca {

  /** Exact upper-triangle Gram matrix over micro-quantized embeddings:
    * g(i,j) = Σ_rows v̂ᵢ·v̂ⱼ with v̂ = round(1e6·v) — integer products
    * summed through DECIMAL(38,0), so the result is EXACT and
    * engine-portable (float Gram sums would differ in low bits by
    * partition order). Quantization error is the caller's contract:
    * ~1e-6 per coordinate, irrelevant for direction estimates.
    *
    * Cost is the d² explode per row — the same multiply-add count any
    * Gram computation pays — pipelined inside codegen with partial
    * aggregation collapsing each task to ≤ d(d+1)/2 cells before the
    * single metadata-scale shuffle. Output: (i, j, g) for i ≤ j,
    * 0-based, g DECIMAL(38,0). */
  def gramMicro(df: DataFrame, embCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val vm = transform(col(embCol), x => round(x.cast("double") * 1e6).cast("long"))
    df.select(vm.as("v"))
      .select(posexplode(col("v")).as(Seq("i", "vi")), col("v"))
      .select(col("i"), col("vi"), posexplode(col("v")).as(Seq("j", "vj")))
      .where(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum((col("vi") * col("vj")).cast(dec)).as("g"))
  }

  /** Top principal direction of a collected Gram matrix via fixed-seed
    * power iteration — deterministic because the input integers are
    * exact and the driver-side float fold has one operation order.
    * `cells` must be [[gramMicro]] output (upper triangle, 0-based).
    * Returns the unit eigenvector (length d) and the Rayleigh
    * quotient (the top eigenvalue in micro²-scaled units). */
  def topPrincipalComponent(cells: DataFrame, iters: Int = 50): (Array[Double], Double) = {
    val tri = cells.select(col("i").cast("int"), col("j").cast("int"),
      col("g").cast("double")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
    require(tri.nonEmpty, "empty Gram matrix")
    val d = tri.map(_._1._2).max + 1
    val m = Array.ofDim[Double](d, d)
    tri.foreach { case ((i, j), g) => m(i)(j) = g; m(j)(i) = g }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val next = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      val n = math.sqrt(next.map(x => x * x).sum)
      require(n > 0, "Gram matrix annihilated the iterate (zero data?)")
      v = next.map(_ / n)
      lambda = n
    }
    (v, lambda)
  }

  /** Per-vector projection onto a fixed component (e.g. the top PC for
    * common-component removal): proj = Σ vᵢ·cᵢ as a plain scan-side
    * dot product — zero shuffles, the component rides as a plan
    * literal. Output: input columns + proj (double). */
  def projectOnto(df: DataFrame, embCol: String, component: Array[Double]): DataFrame = {
    val c = typedlit(component.toSeq)
    df.withColumn("proj",
      aggregate(zip_with(col(embCol).cast("array<double>"), c, _ * _),
        lit(0.0), _ + _))
  }
}
