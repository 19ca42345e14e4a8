package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphTriangleSpec extends SparkSpec {
  import spark.implicits._

  test("triangleCounts on a known graph, robust to dup/reverse/self edges") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus pendant 5
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((2L, 1L), (3L, 3L), (4L, 5L), (4L, 5L)))
      .toDF("src", "dst")
    val out = Graph.triangleCounts(edges, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect.toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangleCounts randomized: equals brute-force enumeration") {
    val rnd = new scala.util.Random(13)
    val es = (1 to 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val out = Graph.triangleCounts(es.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect.toMap
    val eset = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if eset((i, j)) && eset((j, k)) && eset((i, k))
    } { brute(i) += 1; brute(j) += 1; brute(k) += 1 }
    assert(out == brute.toMap)
  }

  private def bruteKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct
    var changed = true
    while (changed) {
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = e.filter(p => keep(p._1) && keep(p._2))
      changed = next.size != e.size
      e = next
    }
    e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  test("kcore: clique survives, chains cascade away; brute-force parity") {
    val clique = for (i <- 0L until 6L; j <- (i + 1) until 6L) yield (i, j)
    val chain = (6L to 30L).map(i => (i - 1, i))
    val edges = (clique ++ chain) :+ (40L, 41L)
    val got = Graph.kcore(edges.toDF("u", "v"), "u", "v", 3)
      .as[(Long, Long)].collect.toMap
    assert(got == bruteKcore(edges, 3))
    assert(got == (0L until 6L).map(_ -> 5L).toMap)
  }

  test("kcore randomized equals iterative brute force across k") {
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    for (k <- Seq(2, 3, 5)) {
      val got = Graph.kcore(edges.toDF("u", "v"), "u", "v", k)
        .as[(Long, Long)].collect.toMap
      assert(got == bruteKcore(edges, k), s"k=$k")
    }
  }

  test("bfsDistances: multi-source hop counts, unreachable absent") {
    // two chains from sources {0, 100}; island {50,51} unreachable
    val edges = (1L to 5L).map(i => (i - 1, i)) ++
      (101L to 103L).map(i => (i - 1, i)) :+ (50L, 51L)
    val src = Seq(0L, 100L).toDF("id")
    val got = Graph.bfsDistances(edges.toDF("u", "v"), "u", "v", src, "id")
      .as[(Long, Long)].collect.toMap
    val want = (0L to 5L).map(i => i -> i).toMap ++
      (100L to 103L).map(i => i -> (i - 100)).toMap
    assert(got == want)
  }

  test("bfsDistances takes the SHORTEST route when chains meet") {
    // ring 0-1-2-3-4-5-0: dist from {0} is min(i, 6-i)
    val ring = (1L to 5L).map(i => (i - 1, i)) :+ (5L, 0L)
    val got = Graph.bfsDistances(ring.toDF("u", "v"), "u", "v",
      Seq(0L).toDF("id"), "id")
      .as[(Long, Long)].collect.toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L, 5L -> 1L))
  }

  test("modularity: two clean components = 0.5, one community = 0, " +
    "missing label raises") {
    // two disjoint triangles, labels = component
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (11L, 12L), (12L, 13L), (13L, 11L)).toDF("src", "dst")
    val lab = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (11L, 1L), (12L, 1L), (13L, 1L)).toDF("node", "label")
    // m = 6; per c: e = 3, d = 6 → Q = 2·(3/6 − (6/12)²) = 0.5
    val got = Graph.modularity(tri, "src", "dst", lab, "node", "label")
      .as[(Long, Long, Option[Long])].collect.head
    assert(got == ((6L, 2L, Some(500000L))), got)
    // everything in one community: Q = m/m − 1² = 0
    val one = lab.select(col("node"), lit(0L).as("label"))
    assert(Graph.modularity(tri, "src", "dst", one, "node", "label")
      .as[(Long, Long, Option[Long])].collect.head._3 == Some(0L))
    // an endpoint missing from labels must raise, not silently drop
    val e = intercept[Exception] {
      Graph.modularity(tri, "src", "dst", lab.where($"node" =!= 13L),
        "node", "label").collect()
    }
    assert(e.getMessage.contains("missing from labels"), e.getMessage)
  }

  test("clusteringCoeff: triangle + pendant = 3/5, triangle-free = 0") {
    // triangle 1-2-3 plus pendant 3-4: wedges 1+1+3+0 = 5, tri = 1
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.clusteringCoeff(g, "src", "dst")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got == ((4L, 5L, 1L, Some(600000L))), got)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got2 = Graph.clusteringCoeff(path, "src", "dst")
      .as[(Long, Long, Long, Option[Long])].collect.head
    assert(got2 == ((3L, 1L, 0L, Some(0L))), got2)
  }

  test("assortativity: a star is perfectly disassortative (−1), a " +
    "regular cycle has zero degree variance (NULL)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = Graph.assortativity(star, "src", "dst")
      .as[(Long, Option[Long])].collect.head
    assert(got == ((3L, Some(-1000000L))), got)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got2 = Graph.assortativity(cycle, "src", "dst")
      .as[(Long, Option[Long])].collect.head
    assert(got2 == ((4L, None)), got2)
  }
}
