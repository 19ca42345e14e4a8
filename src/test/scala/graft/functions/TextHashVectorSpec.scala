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

  test("rollingHash64 deterministic and normalization-stable") {
    val h = docs.select(col("id"), Text.rollingHash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }
}
