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
}
