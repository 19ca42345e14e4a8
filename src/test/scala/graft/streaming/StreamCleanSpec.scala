package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The round-4 scan-shaped cleaners (c4Clean, gopherFilter, stripHtml,
  * fixMojibake, chunkDocs) are stateless per-row transforms — they must
  * run VERBATIM on a streaming DataFrame, no twin needed. This spec is
  * the proof: the same operator calls over readStream micro-batches
  * land on byte-identical rows to the batch run.
  */
class StreamCleanSpec extends SparkSpec {

  test("boilerplateFilterStream: batch-learned chrome set applied on " +
    "a stream equals the batch removal exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val nav = "NAV home"; val foot = "(c) corp"
    val corpus = Seq(
      (1L, "A", s"$nav\nalpha\n$foot"), (2L, "A", s"$nav\nbeta\n$foot"),
      (3L, "A", s"$nav\ngamma\n$foot"), (4L, "B", "delta\nepsilon"),
      (5L, "B", "zeta"), (6L, "B", "eta"))
    val corpusDf = corpus.toDF("id", "dom", "text")
    // learn chrome batch-side from the historical corpus
    val chrome = graft.operators.Dedup.domainBoilerplateLines(
      corpusDf, "id", "dom", "text", minShare = 0.6, minDocs = 3)
      .localCheckpoint(true)
    // stream the SAME docs through the learned set
    val input = MemoryStream[(Long, String, String)]
    val q = StreamClean.boilerplateFilterStream(
        input.toDF().toDF("id", "dom", "text"), "id", "dom", "text", chrome)
      .writeStream.format("memory").queryName("boiler_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus.take(3))
      q.processAllAvailable()
      input.addData(corpus.drop(3))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val streamed = spark.table("boiler_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
        .toSet
      val batch = graft.operators.Dedup.removeDomainBoilerplate(
        corpusDf, "id", "dom", "text", minShare = 0.6, minDocs = 3)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
        .toSet
      assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
      assert(streamed.exists(_._4 > 0), "chrome must actually be cut")
    } finally q.stop()
  }

  test("cleaners and chunker run unchanged on a stream, matching batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def corrupt(t: String) = new String(t.getBytes("UTF-8"), "windows-1252")
    val docs = Seq(
      (1L, "<p>This is a kept sentence with words.</p>\nshort"),
      (2L, corrupt("it’s a naïve doc — ") + (1 to 40).map(i => s"w$i").mkString(" ")),
      (3L, "Lorem ipsum { function() }"),
      (4L, ""))
    val input = MemoryStream[(Long, String)]

    def shape(df: org.apache.spark.sql.DataFrame) = {
      val cleaned = df.select(col("_1").as("doc_id"),
        TextAnalytics.fixMojibake(
          TextAnalytics.stripHtml(col("_2"))).as("text"))
      val c4 = TextAnalytics.c4Clean(cleaned, "doc_id", "text", minKeptLines = 1)
      val gopher = TextAnalytics.gopherFilter(cleaned, "doc_id", "text",
        minWords = 5)
      val chunks = TextAnalytics.chunkDocs(cleaned, "doc_id", "text",
        chunkTokens = 8, stride = 6)
      c4.select(col("doc_id"), lit("c4").as("op"),
          col("clean_text").as("v"), col("keep_doc").cast("string").as("w"))
        .unionByName(gopher.select(col("doc_id"), lit("gopher").as("op"),
          col("mean_len_micro").cast("string").as("v"),
          col("keep_doc").cast("string").as("w")))
        .unionByName(chunks.select(col("doc_id"), lit("chunk").as("op"),
          col("chunk_text").as("v"), col("chunk_idx").cast("string").as("w")))
    }

    val q = shape(input.toDF())
      .writeStream.format("memory").queryName("clean_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(2))
      q.processAllAvailable()
      input.addData(docs.drop(2))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val streamed = spark.table("clean_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      val batch = shape(docs.toDF("_1", "_2")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSet
      assert(streamed == batch, s"stream/batch divergence")
      assert(streamed.exists(_._2 == "chunk"))  // chunker produced rows
    } finally q.stop()
  }
}
