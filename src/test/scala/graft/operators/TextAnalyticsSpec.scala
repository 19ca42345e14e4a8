package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalyticsSpec extends SparkSpec {

  test("ngramOverlapLarge equals the literal-needle ngramOverlap") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps all day long"),
      (3L, "completely unrelated text with no benchmark overlap at all"),
      (4L, "short")
    ).toDF("doc_id", "text")
    // benchmark shingles: bigrams of a needle sentence
    val needleText = "the quick brown fox jumps"
    val needleShingles = needleText.split(" ").sliding(2).map(_.mkString(" ")).toSeq
    val literal = TextAnalytics.ngramOverlap(docs, "doc_id", "text",
      needleShingles, n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val joined = TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text",
      needleShingles.toDF("shingle"), n = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(literal.toSeq == joined.toSeq)
    // sanity: doc 1 overlaps heavily, doc 3 not at all
    val byId = literal.toMap
    assert(byId(1L) > 0.4 && byId(3L) == 0.0)
    // the needle set broadcasts — the corpus side must not shuffle for
    // the probe (only the per-doc aggregate exchanges)
    val plan = TextAnalytics.ngramOverlapLarge(docs, "doc_id", "text",
      needleShingles.toDF("shingle"), n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"needle probe not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }
}
