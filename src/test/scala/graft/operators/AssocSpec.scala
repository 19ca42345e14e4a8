package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssocSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules computes support, confidence, lift on a known basket set") {
    // 4 baskets: {x,y} {x,y} {x,z} {y}; n_x=3 n_y=3 n_xy=2
    val df = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "y"))
      .toDF("b", "i")
    val out = Assoc.pairRules(df, "b", "i", minSupport = 2)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect.toSeq
    assert(out == Seq(("x", "y", 2L, 3L, 3L, 666667L, 666667L,
      math.round(2.0 * 4.0 / 9.0 * 1e6))))
  }

  test("pairRules dedupes within basket and drops oversized baskets") {
    val big = (1 to 50).map(i => (99L, s"i$i"))
    val df = (Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++ big)
      .toDF("b", "i")
    val out = Assoc.pairRules(df, "b", "i", minSupport = 2, maxBasket = 10)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect.toSeq
    // the 50-item basket is dropped: only (a,b)×2 from baskets 1,2 remain,
    // and the duplicate (1,a) counts once
    assert(out == Seq(("a", "b", 2L, 2L, 2L, 1000000L, 1000000L,
      math.round(2.0 * 2.0 / 4.0 * 1e6))))
  }
}
