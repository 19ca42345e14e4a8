package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {

  test("index-mediated BM25 equals the direct corpus scan; probe prunes to term buckets") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark joins the vector stream quickly"),
      (2L, "the quick brown fox"),
      (3L, "vector vector vector stream"),
      (4L, "join join spark"),
      (5L, "nothing relevant here at all"),
      (6L, "stream of consciousness")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("inv_spec").toString
    InvertedIndex.write(docs, "doc_id", "text", tmp, buckets = 8)
    val terms = Seq("spark", "vector", "stream")
    val hits = InvertedIndex.searchBm25(s, tmp, terms, k = 10)
    // ground truth: the scan-per-query operator on the same corpus —
    // the index's denormalized (tf, dl, df) must reproduce it exactly
    val direct = TextAnalytics.bm25Scores(docs, "doc_id", "text", terms)
      .where(col("score_micro") > 0)
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val got = hits.orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == direct, s"index search diverged: got=$got want=$direct")
    // k cuts deterministically by (score desc, doc asc)
    val top2 = InvertedIndex.searchBm25(s, tmp, terms, k = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(top2 == direct.take(2).map(_._1))
    // the postings scan prunes to the probed bucket directories
    val plan = hits.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "postings scan lost its bucket partition filter")
    // unknown terms: empty result, no error
    assert(InvertedIndex.searchBm25(s, tmp, Seq("zzzznope"), k = 5).count() == 0)
  }

  test("trigram search: equals direct scan, kills non-contiguous candidates, prunes buckets") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick abcd fox"),
      (2L, "abc here and bcd there"), // all trigrams of "abcd", not contiguous
      (3L, "no match at all"),
      (4L, "ends with abcd"),
      (5L, "ab")                      // shorter than a trigram
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("trgm_spec").toString
    InvertedIndex.writeTrigram(docs, "doc_id", "text", tmp, buckets = 8)
    val hits = InvertedIndex.searchSubstring(s, tmp, docs, "doc_id", "text", "abcd")
    // doc 2 is a candidate (has "abc" and "bcd") but MUST be verified out
    assert(hits.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    // equals the direct scan on a second needle
    val direct = docs.where(col("text").contains("ck ab"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val viaIdx = InvertedIndex.searchSubstring(s, tmp, docs, "doc_id", "text", "ck ab")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIdx == direct && direct == Seq(1L))
    // the trigram read prunes to the needle's buckets
    val plan = hits.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "trigram scan lost its bucket partition filter")
    // sub-trigram needles are rejected (caller scans directly)
    intercept[IllegalArgumentException] {
      InvertedIndex.searchSubstring(s, tmp, docs, "doc_id", "text", "ab")
    }
    // append: new docs join the searchable set without a rebuild
    val more = Seq((6L, "late arrival with abcd too")).toDF("doc_id", "text")
    InvertedIndex.appendTrigram(more, "doc_id", "text", tmp)
    val all = docs.unionByName(more)
    val after = InvertedIndex.searchSubstring(s, tmp, all, "doc_id", "text", "abcd")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == Seq(1L, 4L, 6L), s"appended doc must be found: $after")
  }

  test("positional index: phrase hits by position intersection, " +
    "multiple and repeated-term occurrences counted") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "big cat sat"),
      (2L, "the big cat big cat"),
      (3L, "big dog"),
      (4L, "cat big")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pos_t").toString
    InvertedIndex.writePositional(docs, "doc_id", "text", tmp, buckets = 4)
    val hits = InvertedIndex.searchPhrase(s, tmp, "big cat")
      .as[(Long, Long)].collect.toMap
    // doc2 holds the phrase twice; doc4 has both words but reversed
    assert(hits == Map(1L -> 1L, 2L -> 2L), hits)
    // a phrase with a REPEATED term must require both offsets
    val rep = InvertedIndex.searchPhrase(s, tmp, "big cat big")
      .as[(Long, Long)].collect.toMap
    assert(rep == Map(2L -> 1L), rep)
    // ground truth parity: equals the direct token-scan count
    val none = InvertedIndex.searchPhrase(s, tmp, "cat sat big")
      .collect()
    assert(none.isEmpty)
  }
}
