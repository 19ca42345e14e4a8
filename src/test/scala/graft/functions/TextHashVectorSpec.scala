package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextHashVectorSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "the  quick   brown fox jumps over the lazy dog"), // ws-variant dup
      (3L, "der hund ist nicht das problem und die katze"),
      (4L, ""),
      (5L, "one")
    ).toDF("id", "text")
  }

  test("tokenCount handles whitespace runs and empty text") {
    val r = docs.select(col("id"), Text.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r(1L) == 9 && r(2L) == 9 && r(4L) == 0 && r(5L) == 1)
  }

  test("fingerprint is whitespace/case-insensitive (normalized md5)") {
    val fps = docs.select(col("id"), Text.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("langId picks marker-language, und when no hits") {
    val langs = docs.select(col("id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en")
    assert(langs(3L) == "de")
    assert(langs(5L) == "und")
  }

  test("wordShingles: HOF and native kernel agree exactly") {
    for (n <- Seq(2, 3, 5)) {
      val hof = docs.select(col("id"), Text.wordShingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val nat = docs.select(col("id"),
          graft.plans.native.wordShingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(hof == nat, s"n=$n")
    }
  }

  test("minhash signatures: identical docs get identical signatures") {
    val sig = docs.select(col("id"),
        graft.plans.native.minhashSig(
          array_distinct(graft.plans.native.wordShingles(col("text"), 3)), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L) == sig(2L)) // normalization folds the ws variant
    assert(sig(1L) != sig(3L))
    assert(sig(1L).size == 64)
  }

  test("simhash: near-identical docs within small hamming distance") {
    val fp = docs.select(col("id"),
        Hashes.simhash64(Text.tokens(Text.normalizeText(col("text")))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(2L)) == 0)
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 10)
  }

  test("cosine: native kernel matches HOF formulation bit-exactly") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, 0.5f, 2.5f)),
      (3L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("id", "v")
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        Vectors.cosine(col("a.v"), col("b.v")).as("native"),
        Vectors.cosineHof(col("a.v"), col("b.v")).as("hof"))
      .collect()
    pairs.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    }
  }

  test("sortedIntersectCount: merge count == size(array_intersect) on " +
    "sorted distinct arrays, including empty and disjoint") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "c", "x")),
      (Seq("a", "b"), Seq("c", "d")),          // disjoint
      (Seq.empty[String], Seq("a")),           // empty left
      (Seq("a", "é", "日"), Seq("a", "z", "é", "日")), // non-ASCII binary order
      (Seq("a", "b", "c"), Seq("a", "b", "c"))  // identical
    ).toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val got = df.select(
      graft.plans.native.sortedIntersectCount(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 0L, 0L, 3L, 3L))
  }

  test("rollingHash64 deterministic and normalization-stable") {
    val h = docs.select(col("id"), Text.rollingHash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }
}

class RandomProjectionSpec extends SparkSpec {

  test("randomProjection is deterministic and JL-preserves pairwise distances") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(53)
    val vecs = (0L until 40L).map { i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val proj = vecs.select(col("vec_id"),
      Vectors.randomProjection(col("embedding"), 64, 16).as("p"))
    val p1 = proj.orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    val p2 = vecs.select(col("vec_id"),
        Vectors.randomProjection(col("embedding"), 64, 16).as("p"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    assert(p1.zip(p2).forall { case (a, b) => a.sameElements(b) }) // deterministic
    assert(p1.forall(_.length == 16))
    val orig = vecs.orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val pairs = for (i <- 0 until 40; j <- i + 1 until 40 if (i + j) % 7 == 0)
      yield (dist(orig(i), orig(j)), dist(p1(i), p1(j)))
    // JL at outDim 16: distances preserved within a loose band — check
    // the mean relative distortion and that no pair collapses/explodes
    val distortions = pairs.map { case (d0, d1) => math.abs(d1 - d0) / d0 }
    assert(distortions.sum / distortions.size < 0.35,
      s"mean distortion ${distortions.sum / distortions.size}")
    assert(distortions.max < 1.0, s"worst distortion ${distortions.max}")
  }
}

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  test("jaroWinkler: canonical literature values, boost threshold, " +
    "empty-string convention") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.961111),   // the textbook example
      ("DIXON", "DICKSONX", 0.813333),
      ("JELLYFISH", "SMELLYFISH", 0.896296), // no common prefix → no boost
      ("DWAYNE", "DUANE", 0.84),
      ("TRATE", "TRACE", 0.906667),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("abcdxxxxxx", "abcdyyyyyy", 0.6), // j = 0.6 ≤ 0.7 → boost withheld
      ("a", "", 0.0),                    // either empty → 0 (DuckDB parity)
      ("", "", 0.0))
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("a", "b")
      .select(org.apache.spark.sql.functions.round(
        graft.plans.native.jaroWinkler($"a", $"b"), 6).as("jw"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, want), g) =>
      assert(g == want, s"jw($a, $b) = $g, want $want")
    }
  }
}
