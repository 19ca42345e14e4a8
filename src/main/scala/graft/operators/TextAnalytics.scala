package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level text analytics for training-data pipelines — all
  * single-shuffle aggregations over codegen'd string expressions.
  */
object TextAnalytics {

  /** Redact emails and phone-like numbers. RE2-compatible patterns so
    * the same regexes run in any engine. */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}[-. ]\\d{4}\\b"
    regexp_replace(regexp_replace(c, email, "<EMAIL>"), phone, "<PHONE>")
  }

  /** Most frequent lowercase tokens across the corpus: (term, n),
    * top `n` by count desc then term asc. Map-side partial counts →
    * one shuffle; the limit is a TakeOrdered, no global sort. */
  def topTerms(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(n)

  /** Adjacent-token bigram counts with a minimum frequency. */
  def bigramCounts(df: DataFrame, textCol: String, minCount: Long): DataFrame =
    df.select(explode(graft.plans.native.wordShingles(col(textCol), 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  /** Benchmark-contamination scan: which documents contain which
    * needle phrases (broadcast needles — the list is tiny, the corpus
    * is not; no shuffle of the corpus). */
  def contamination(df: DataFrame, idCol: String, textCol: String,
                    needles: Seq[String]): DataFrame = {
    val needleCol = explode(array(needles.map(lit): _*)).as("needle")
    df.select(col(idCol), lower(col(textCol)).as("t"))
      .select(col(idCol), col("t"), needleCol)
      .where(col("t").contains(col("needle")))
      .drop("t")
  }
}
