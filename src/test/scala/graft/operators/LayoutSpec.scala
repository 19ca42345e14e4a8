package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits dimension-by-dimension") {
    val s = spark
    import s.implicits._
    // x=2 (0b10), y=1 (0b01) → z bits: b0 of x at 0 (0), b0 of y at 1
    // (1), b1 of x at 2 (1), b1 of y at 3 (0) → 0b0110 = 6
    val out = Seq((2L, 1L), (0L, 0L), (3L, 3L), (255L, 0L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 8).as("z"))
      .collect().map(_.getLong(0))
    assert(out(0) == 6L)
    assert(out(1) == 0L)
    assert(out(2) == 15L) // 0b1111: both low two bits set in both dims
    // 255 = 0b11111111 spread to even bit positions: 0b0101010101010101
    assert(out(3) == 0x5555L)
  }

  test("zorderWrite clusters BOTH dimensions; a plain sort clusters only one") {
    val s = spark
    import s.implicits._
    // 256×256 grid: every (x, y) cell once
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toFile
    Layout.zorderWrite(grid, Seq("x", "y"), bits = 8, numFiles = 16,
      path = s"$tmp/z.parquet")
    val back = spark.read.parquet(s"$tmp/z.parquet")
    assert(back.count() == 256L * 256L)
    def avgSpan(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val spans = df.groupBy(input_file_name().as("f"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }
    // ideal for 16 files on a 256×256 z-curve: 4 z-prefix bits = 2
    // bits per dimension = span 63 per file in BOTH x and y; allow
    // slack for range-sampler split points landing off tile borders
    val (sx, sy) = (avgSpan(back, "x"), avgSpan(back, "y"))
    assert(sx < 128 && sy < 128,
      s"z-order must cluster both dims (ideal 63): x=$sx y=$sy")
    // the single-column-sort baseline leaves the OTHER dim unclustered
    val tmp2 = java.nio.file.Files.createTempDirectory("xsort").toFile
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$tmp2/x.parquet")
    val xs = spark.read.parquet(s"$tmp2/x.parquet")
    assert(avgSpan(xs, "y") > 250,
      "baseline sanity: x-sorted files span all of y")
    assert(sy < avgSpan(xs, "y") / 2,
      s"z-order must beat the linear sort on the second dim: $sy")
  }
}

class CompactionSpec extends SparkSpec {

  test("packBySize bins by exclusive cumulative size over (size DESC, id)") {
    val s = spark
    import s.implicits._
    // sorted by size desc: 900, 800, 500, 300, 100 → cum-before
    // 0, 900, 1700, 2200, 2500 → div 1000 → bins 0, 0, 1, 2, 2
    val m = Seq(("a", 900L), ("b", 800L), ("c", 500L), ("d", 300L), ("e", 100L))
      .toDF("file", "bytes")
    val got = Layout.packBySize(m, "file", "bytes", 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 2L, "e" -> 2L))
  }

  test("compact rewrites many small files into few, preserving all rows") {
    val s = spark
    import s.implicits._
    val in = java.nio.file.Files.createTempDirectory("compact_in").toString
    // 20 single-row files (repartition(1) per write)
    (1 to 20).foreach { i =>
      Seq((i.toLong, s"row$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(in)
    }
    val nIn = new java.io.File(in).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nIn == 20)
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString
    val manifest = Layout.compact(spark, in, out, targetBytes = 4096L)
    val back = spark.read.parquet(out)
    assert(back.count() == 20)
    assert(back.select("id").collect().map(_.getLong(0)).toSet == (1L to 20L).toSet)
    val nOut = new java.io.File(out).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val bins = manifest.collect()
    assert(nOut == bins.length && nOut < nIn,
      s"expected fewer output files: in=$nIn out=$nOut bins=${bins.length}")
    assert(bins.map(_.getLong(1)).sum == 20L) // every input file planned
  }
}

class AnalyzeSpec extends SparkSpec {

  test("analyze profiles columns in one pass: nulls, distincts, min/max") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("x"), 10),
      (2L, None, 20),
      (3L, Some("y"), 10),
      (4L, Some("x"), 30)
    ).toDF("id", "name", "grp")
    val got = KeyChecks.analyze(df, Seq("id", "name", "grp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("name") == ((4L, 1L, 2L, "x", "y"))) // distinct ignores null
    assert(got("grp") == ((4L, 0L, 3L, "10", "30")))
    // approx mode stays close on small data
    val approx = KeyChecks.analyze(df, Seq("id"), exact = false).collect()(0)
    assert(math.abs(approx.getLong(3) - 4L) <= 1)
  }
}

class GraphSpec extends SparkSpec {

  test("pagerankInt: hand-computed one round, hubs dominate after three") {
    val s = spark
    import s.implicits._
    // a→c, b→c, c→a (all outdeg 1). Round 1 in micro-units:
    //   a: 150000 + 85% of c's 1e6  = 1000000
    //   b: 150000 + 0               = 150000
    //   c: 150000 + 85% of (a+b)=2e6 = 1850000
    val tri = Seq((1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graph.pagerankInt(tri, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 150000L, 3L -> 1850000L), r1)
    // determinism across runs (exact integer arithmetic)
    val r1b = Graph.pagerankInt(tri, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r1b)
    // star graph: 50 leaves → 1 hub; after 3 rounds the hub holds the
    // mass, every leaf sits at the teleport floor
    val star = (10L to 59L).map(i => (i, 1L)).toDF("src", "dst")
    val r3 = Graph.pagerankInt(star, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(1L) > 40L * 150000L, s"hub=${r3(1L)}")
    assert((10L to 59L).forall(r3(_) == 150000L))
  }

  test("pagerankInt dangling: sink mass redistributes, hand-computed") {
    val s = spark
    import s.implicits._
    // chain 1→2→3; 3 is a sink. N=3, share_r = ds // 3.
    // r1: ds=1e6, share=333333
    //   1: 150000 + (0       +333333)*85//100 =  433333
    //   2: 150000 + (1000000 +333333)*85//100 = 1283333
    //   3: same as 2                          = 1283333
    // r2: ds=1283333, share=427777
    //   1: 150000 + (0      +427777)*85//100 =  513610
    //   2: 150000 + (433333 +427777)*85//100 =  881943
    //   3: 150000 + (1283333+427777)*85//100 = 1604443
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r2 = Graph.pagerankInt(chain, "src", "dst", iters = 2, dangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 513610L, 2L -> 881943L, 3L -> 1604443L), r2)
    // conservation: with redistribution, total rank stays near N·1e6
    // (teleport floor + damped mass; without it the sink leaks all of it)
    val total = r2.values.sum
    assert(total > 2900000L && total <= 3000000L, s"total=$total")
    val leaky = Graph.pagerankInt(chain, "src", "dst", iters = 2)
      .collect().map(_.getLong(1)).sum
    assert(leaky < total, s"leaky=$leaky total=$total")
  }

  test("pagerankInt convergeEarly: 2-cycle fixpoint stops before iters") {
    val s = spark
    import s.implicits._
    // 1↔2: r' = 150000 + 85% of r → already at the 1e6 fixpoint, so
    // round 2's signature equals round 1's and the loop stops there
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val (ranks, rounds) = Graph.pagerankIntRounds(
      cyc, "src", "dst", iters = 50, convergeEarly = true)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L), got)
    assert(rounds == 2, s"rounds=$rounds")
    // early stop returns the same table as running the full budget
    val full = Graph.pagerankInt(cyc, "src", "dst", iters = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full)
  }

  test("hitsCounts: hand-computed path counts on a tiny bipartite graph") {
    val s = spark
    import s.implicits._
    // 1→10, 2→10, 2→11. hub1 = outdeg: (1)=1, (2)=2.
    // auth1(10) = 1+2 = 3, auth1(11) = 2.
    // hub2(1) = auth1(10) = 3; hub2(2) = 3+2 = 5.
    // auth2(10) = hub2(1)+hub2(2) = 8; auth2(11) = hub2(2) = 5.
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val r2 = Graph.hitsCounts(e, "src", "dst", rounds = 2)
      .as[(Long, Long, Long)].collect.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r2 == Map(1L -> ((3L, 0L)), 2L -> ((5L, 0L)),
      10L -> ((0L, 8L)), 11L -> ((0L, 5L))), r2)
    // rounds=1 is the degree half-step
    val r1 = Graph.hitsCounts(e, "src", "dst", rounds = 1)
      .as[(Long, Long, Long)].collect.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r1 == Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L)),
      10L -> ((0L, 3L)), 11L -> ((0L, 2L))), r1)
  }

  test("adamicAdar: hand-computed terms, df cap and minCommon filters") {
    val s = spark
    import s.implicits._
    // z=100 shared by {1,2,3} (deg 3), z=101 by {1,2} (deg 2),
    // z=102 only {1} (deg 1 → no pair), z=103 by {1,2,3,4,5} (deg 5
    // → dropped at maxDeg=4)
    val e = (Seq(1L, 2L, 3L).map((_, 100L)) ++ Seq(1L, 2L).map((_, 101L)) ++
      Seq((1L, 102L)) ++ Seq(1L, 2L, 3L, 4L, 5L).map((_, 103L)))
      .toDF("a", "z")
    val t3 = math.round(1e6 / math.log(3.0)) // 910239
    val t2 = math.round(1e6 / math.log(2.0)) // 1442695
    val got = Graph.adamicAdar(e, "a", "z", maxDeg = 4, minCommon = 2)
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(got == Seq((1L, 2L, 2L, t3 + t2)), got)
    // minCommon=1 surfaces the single-neighbor pairs too
    val loose = Graph.adamicAdar(e, "a", "z", maxDeg = 4, minCommon = 1)
      .as[(Long, Long, Long, Long)].collect
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(loose((1L, 3L)) == ((1L, t3)) && loose((2L, 3L)) == ((1L, t3)))
  }

  test("personalizedPagerankInt: teleport mass lands only on seeds, " +
    "hand-computed round") {
    val s = spark
    import s.implicits._
    // 1→2, 2→1, 3→1; seed {1}. N=3, |S|=1 → baseSeed = 15·10⁴·3 = 450000.
    // Round 1 from uniform 1e6 (all outdeg 1):
    //   node1: 450000 + 85%·(r(2)+r(3)) = 450000 + 1700000 = 2150000
    //   node2: 0 + 85%·r(1) = 850000;  node3: 0 (no in-edges)
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r1 = Graph.personalizedPagerankInt(e, "src", "dst", seeds,
      "node", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2150000L, 2L -> 850000L, 3L -> 0L), r1)
    // rank keeps concentrating near the seed set over rounds
    val r3 = Graph.personalizedPagerankInt(e, "src", "dst", seeds,
      "node", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3(1L) > r3(2L) && r3(2L) > r3(3L), r3)
    // a seed that never appears in the edge set is rejected
    val bad = Seq(Tuple1(99L)).toDF("node")
    intercept[IllegalArgumentException] {
      Graph.personalizedPagerankInt(e, "src", "dst", bad, "node", 1)
    }
  }

  test("labelPropagation: two bridged triangles split into their own " +
    "communities, hand-replayed rounds") {
    val s = spark
    import s.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3–4. After 3 synchronous
    // rounds with the (count desc, label asc) tie-break the labels
    // settle to {1,1,1, 3,3,3} (hand-replayed round by round).
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect.toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), got)
    // symmetrization: direction of the input edges must not matter
    val rev = Graph.labelPropagation(
      e.select(col("dst").as("src"), col("src").as("dst")),
      "src", "dst", rounds = 3)
      .as[(Long, Long)].collect.toMap
    assert(rev == got)
  }
}
