package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining: which items co-occur beyond
  * chance. The support counting here is the A-priori first pass (the
  * only pass that touches the corpus) expressed as joins + map-side
  * combined aggregates; the lift/confidence arithmetic follows the
  * exact-integer-moments replay discipline.
  */
object Assoc {

  /** Pairwise association rules over baskets: for every unordered
    * item pair co-occurring in ≥ `minSupport` baskets, its joint
    * support, per-item supports, directed confidences, and lift — all
    * derived from exact long counts in fixed float order (micros).
    *
    * `maxBasket` drops baskets larger than the cap BEFORE the pair
    * fan-out — the quadratic guard: one degenerate "basket" (a crawl
    * session touching everything) otherwise contributes size² pairs.
    * Same broadcast-anti-join shape as the q16/q17 hot-shingle caps.
    *
    * Scale: distinct → pair self-join keyed on basket (pairs bounded
    * by capped basket size² per basket), pair counts map-side
    * combined; item supports ride a broadcast join (item domain ≪
    * corpus). Lift = P(ab)/(P(a)P(b)) with n_baskets the post-cap
    * basket count. Output: (item_a, item_b, n_ab, n_a, n_b,
    * conf_ab_micro, conf_ba_micro, lift_micro). */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Int = 3, maxBasket: Int = 1000): DataFrame = {
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val big = items.groupBy("b").agg(count(lit(1)).as("bsz"))
      .where(col("bsz") > maxBasket).select("b")
    // capped is read four times (both self-join sides, item supports,
    // basket count): materialize it ONCE — without the cut each
    // reference re-plans the distinct + anti-join subtree (23 exchanges
    // vs ~7). The count below rides the same materialization. Blocks
    // back the returned frame; free at a query boundary
    // (graft.plans.Blocks.releaseAll).
    val capped = items.join(broadcast(big), Seq("b"), "left_anti")
      .localCheckpoint(true)
    val nBaskets = capped.select("b").distinct().count()
    val pairs = capped
      .join(capped.select(col("b"), col("i").as("i2")), Seq("b"))
      .where(col("i") < col("i2"))
      .groupBy(col("i").as("item_a"), col("i2").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val supp = capped.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val joined = pairs
      .join(broadcast(supp.select(col("i").as("item_a"), col("n_i").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(supp.select(col("i").as("item_b"), col("n_i").as("n_b"))),
        Seq("item_b"))
    def micro(c: org.apache.spark.sql.Column) = round(c * 1e6).cast("long")
    joined.select(
      col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
      micro(col("n_ab").cast("double") / col("n_a").cast("double"))
        .as("conf_ab_micro"),
      micro(col("n_ab").cast("double") / col("n_b").cast("double"))
        .as("conf_ba_micro"),
      micro(col("n_ab").cast("double") * lit(nBaskets.toDouble)
        / (col("n_a").cast("double") * col("n_b").cast("double")))
        .as("lift_micro"))
  }
}
