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
    * Scale: ONE corpus exchange (groupBy basket, map-side-combined
    * collect_set) building cap-bounded sorted item lists, then i<j
    * pairs generated IN-ROW with nested posexplode/slice (the q16
    * `cappedShinglePairs` shape, Dedup.scala — no join build/probe:
    * the pair stream flows from the grouped lists straight into the
    * map-side-combined per-pair count); item supports explode from
    * the same lists and ride a broadcast join (item domain ≪
    * corpus). Lift = P(ab)/(P(a)P(b)) with n_baskets the post-cap
    * basket count folded in as a broadcast scalar. Output: (item_a,
    * item_b, n_ab, n_a, n_b, conf_ab_micro, conf_ba_micro,
    * lift_micro).
    *
    * Round-8 measured history (q168 gate, sf0.1, local[32], 2-pass
    * min): basket-keyed pair self-join 4.11 s → in-row pairs 2.70 s
    * → fused single-exchange shape 1.69 s. The residual vs DuckDB's
    * 0.21 s replay is the per-exchange dispatch floor (~0.5-0.7 s ×
    * 3 exchanges: corpus groupBy + pair count + supports), not plan
    * shape — the same engine constant documented on q16/q119. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minSupport: Int = 3, maxBasket: Int = 1000): DataFrame = {
    // ONE corpus exchange: groupBy(basket) with a map-side-combined
    // collect_set fuses the former distinct + size-count + broadcast
    // anti-join + collect_list cascade (round-8 rework: the old shape
    // paid TWO corpus shuffles plus the anti-join; per-exchange cost
    // is the dominant constant at gate scale and a real cost at
    // 100 TB). The quadratic guard is intact — the size filter runs
    // BEFORE any pair fans out; a degenerate basket costs one
    // spillable set buffer of its DISTINCT items (map-side partial
    // sets dedupe en route, ObjectHashAggregate spills), then drops.
    // Null items never enter the set (collect_set skips nulls, like
    // the former `i < i2` comparison) but still count toward the cap
    // via the has_null flag — identical cap semantics to the
    // distinct-row count the oracle replays.
    val groups = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy("b")
      .agg(sort_array(collect_set(col("i"))).as("xs"),
        max(when(col("i").isNull, 1).otherwise(0)).as("has_null"))
      .where(size(col("xs")) + col("has_null") <= maxBasket)
      .select("xs")
      .localCheckpoint(false)
    // basket count folded into the plan as a broadcast scalar — a
    // driver-side .count() would cost a whole extra job (and force
    // eager materialization); as a frame it rides the one action, and
    // the LAZY checkpoint materializes under the first broadcast job
    val nb = groups.agg(count(lit(1)).as("n_baskets"))
    // ordered pairs generated IN-ROW from the sorted cap-bounded
    // lists (the q16 cappedShinglePairs shape, Dedup.scala): item_a <
    // item_b falls out of the sort, no post-filter, no join
    val pairs = groups
      .select(col("xs"), posexplode(col("xs")))
      .select(col("col").as("item_a"),
        explode(slice(col("xs"), col("pos") + lit(2), size(col("xs"))))
          .as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val supp = groups.select(explode(col("xs")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val joined = pairs
      .join(broadcast(supp.select(col("i").as("item_a"), col("n_i").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(supp.select(col("i").as("item_b"), col("n_i").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nb))
    def micro(c: org.apache.spark.sql.Column) = round(c * 1e6).cast("long")
    joined.select(
      col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
      micro(col("n_ab").cast("double") / col("n_a").cast("double"))
        .as("conf_ab_micro"),
      micro(col("n_ab").cast("double") / col("n_b").cast("double"))
        .as("conf_ba_micro"),
      micro(col("n_ab").cast("double") * col("n_baskets").cast("double")
        / (col("n_a").cast("double") * col("n_b").cast("double")))
        .as("lift_micro"))
  }
}
