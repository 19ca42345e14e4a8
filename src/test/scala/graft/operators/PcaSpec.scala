package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gramMicro equals the driver-side exact integer Gram") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 0.0f)),
      (2L, Array(1.0f, 0.5f, -0.5f)),
      (3L, Array(0.0f, 0.0f, 1.0f)))
    val df = vecs.toDF("id", "embedding")
    val got = Pca.gramMicro(df, "embedding")
      .select(col("i"), col("j"), col("g").cast("long"))
      .as[(Int, Int, Long)].collect.map(r => (r._1, r._2) -> r._3).toMap
    val q = vecs.map(_._2.map(x => math.round(x.toDouble * 1e6)))
    for (i <- 0 until 3; j <- i until 3) {
      val want = q.map(v => v(i) * v(j)).sum
      assert(got((i, j)) == want, s"cell ($i,$j)")
    }
    assert(got.size == 6) // upper triangle of 3x3
  }

  test("topPrincipalComponent recovers a planted dominant direction") {
    // vectors mostly along (3,4)/5 with small deterministic jitter
    val dir0 = Array(0.6, 0.8)
    val vecs = (1 to 200).map { i =>
      val s = if (i % 2 == 0) 1.0 else -1.0
      val jit = (i % 7 - 3) * 0.01
      (i.toLong, Array((s * dir0(0) + jit).toFloat, (s * dir0(1) - jit).toFloat))
    }
    val gram = Pca.gramMicro(vecs.toDF("id", "embedding"), "embedding")
    val (v, lambda) = Pca.topPrincipalComponent(gram)
    val cos = math.abs(v(0) * dir0(0) + v(1) * dir0(1))
    assert(cos > 0.999, s"cos=$cos v=${v.toSeq}")
    assert(lambda > 0)
    // deterministic: a second run returns bit-identical output
    val (v2, l2) = Pca.topPrincipalComponent(gram)
    assert(v.toSeq == v2.toSeq && lambda == l2)
  }

  test("projectOnto is a zero-shuffle scan and computes the dot product") {
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(-1.0f, 0.5f)))
      .toDF("id", "embedding")
    val out = Pca.projectOnto(df, "embedding", Array(2.0, 1.0))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val got = out.select("id", "proj").as[(Long, Double)].collect.toMap
    assert(got(1L) == 4.0 && got(2L) == -1.5)
  }
}
