package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {

  test("bloomSemiJoin equals the plain semi-join; probe is a pre-join scan filter") {
    val s = spark
    import s.implicits._
    // parquet-backed so the probe filter survives in the plan
    // (ConvertToLocalRelation folds filters over in-memory relations)
    val tmp = java.nio.file.Files.createTempDirectory("bloomjoin_spec").toString
    (1L to 5000L).map(i => (i, i % 250)).toDF("row_id", "fk")
      .write.parquet(s"$tmp/big")
    val big = s.read.parquet(s"$tmp/big")
    val dim = Seq(3L, 17L, 101L, 249L).toDF("pk")
    val viaBloom = Joins.bloomSemiJoin(big, "fk", dim, "pk")
      .collect().map(_.getLong(0)).sorted.toSeq
    val plain = big.join(dim.select(col("pk").as("fk")), Seq("fk"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == plain && plain.nonEmpty,
      "bloom path must reproduce the exact semi-join")
    // the Bloom probe shows up as a scan-side filter (unrolled
    // element_at bit tests over the literal word array — codegen-able,
    // no HOF), not as an extra join or exchange
    val plan = Joins.bloomSemiJoin(big, "fk", dim, "pk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("element_at"), s"expected the bloom probe filter in:\n$plan")
    assert(!plan.contains("forall"), "probe must be the unrolled codegen form")
    assert(plan.split("Join").length - 1 == 1,
      s"exactly ONE join (the exact semi-join) expected:\n$plan")
    // empty dimension: empty result, no job blow-up
    assert(Joins.bloomSemiJoin(big, "fk", dim.where(lit(false)), "pk").count() == 0)
    // NULL fks never pass (semi-join semantics preserved)
    val withNull = Seq(Tuple1(Option.empty[Long]), Tuple1(Some(3L))).toDF("fk")
    assert(Joins.bloomSemiJoin(withNull, "fk", dim, "pk").count() == 1)
  }

  test("rendezvousAssign: balanced, deterministic, and adding a shard moves only its keys") {
    val s = spark
    import s.implicits._
    val keys = (1L to 3000L).toDF("k")
    val three = Seq("a", "b", "c")
    val m3 = Joins.rendezvousAssign(keys, "k", three)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // deterministic rerun
    val again = Joins.rendezvousAssign(keys, "k", three)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m3 == again)
    // roughly balanced: each shard gets 1/3 +- 40%
    val counts = m3.values.groupBy(identity).view.mapValues(_.size)
    assert(counts.values.forall(c => c > 600 && c < 1400), counts.toMap.toString)
    // THE property: with shard d added, every changed key moved TO d
    val m4 = Joins.rendezvousAssign(keys, "k", three :+ "d")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = m3.keys.filter(k => m3(k) != m4(k)).toSeq
    assert(moved.nonEmpty && moved.forall(k => m4(k) == "d"),
      "rendezvous movement must only target the new shard")
    // and ~1/4 of keys moved (1/(n+1)), +- 40%
    assert(moved.size > 450 && moved.size < 1050, s"moved=${moved.size}")
    // portable mode routes identically across reruns too
    val p = Joins.rendezvousAssign(keys, "k", three, portableHash = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p.values.toSet.subsetOf(three.toSet))
  }

  test("saltedJoin: row-identical to the plain inner join on a " +
    "skewed key; the salt composites into the join key") {
    val s = spark
    import s.implicits._
    // one hot key (90% of rows) + tail
    val big = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong)))
      .toDF("k", "payload")
    val small = (1L to 10L).map(k => (k, s"name$k")).toDF("k", "nm")
    val salted = Joins.saltedJoin(big, small, "k", salts = 8)
      .groupBy("k", "nm").agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect.toSet
    val plain = big.join(small, Seq("k"))
      .groupBy("k", "nm").agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect.toSet
    assert(salted == plain && plain.exists(_._3 == 900L), salted)
    val plan = Joins.saltedJoin(big, small, "k", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }
}
