package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (one JSON object per line) corpus source/sink — the wire
  * format raw LLM training corpora usually arrive in (Common-Crawl
  * derivatives, chat logs, scraped dumps), complementing the parquet
  * scan ([[Scan]]) on the ingest side of the pipeline.
  *
  * Scale posture: a JSONL read with an EXPLICIT schema is a single
  * splittable scan (uncompressed/bzip2 files split by range; one task
  * per file otherwise — prefer many medium files over one giant
  * gzip, which serializes the read). Schema inference is deliberately
  * not exposed: it costs a full extra pass over 100 TB before any work
  * starts, and silently widens types on dirty data — corpus schemas
  * are contracts, so callers pass one.
  *
  * Dirty lines are the norm in scraped corpora: [[read]] is PERMISSIVE
  * (malformed lines surface in a corrupt-record column instead of
  * failing the job hours in), [[readClean]] drops them, and
  * [[corruptLines]] is the audit view (file + raw line) so ingest can
  * quantify and sample what it discarded — the q26/ZipTsv "repair
  * ladder" posture applied to JSON.
  */
object Jsonl {

  /** Write as JSONL. `compression`: none|gzip|snappy|lz4|zstd… — note
    * gzip output is not splittable on re-read. */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** Tolerant read with an explicit schema: malformed lines land whole
    * in `corruptCol` (their data columns null) instead of failing the
    * job. */
  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** [[read]] minus the malformed lines (and the audit column).
    * Implemented over the text source + from_json rather than
    * filter-and-drop on [[read]]: column pruning on the latter can
    * leave the corrupt column as the scan's ONLY referenced column
    * (e.g. `readClean(...).count()`), which Spark rejects outright
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN). from_json field access gets
    * the same projection pruning via the JSON-expression optimizer
    * rules, so nothing is lost at scale. */
  def readClean(spark: SparkSession, path: String, schema: StructType,
                corruptCol: String = "_corrupt_record"): DataFrame = {
    val withCorrupt = schema.add(corruptCol, StringType)
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("p"))
      .where(col("p").isNotNull && col(s"p.$corruptCol").isNull)
      .select(schema.fieldNames.toSeq.map(f => col(s"p.`$f`").as(f)): _*)
  }

  /** Streaming twin of [[read]]: the same explicit-schema tolerant
    * parse as a file-source stream — shards landing in `path` are
    * processed exactly once under the file-source contract (pairs
    * with FfiecPipeline.processStream's checkpointed ingest posture).
    * Filter the corrupt column / drop it downstream exactly as with
    * the batch read. `maxFilesPerTrigger` bounds per-batch work. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
                 corruptCol: String = "_corrupt_record",
                 maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)

  /** Audit view of what [[readClean]] would drop: (file, corrupt_line).
    * Reads the text source and re-parses with from_json — Spark
    * disallows JSON-source queries whose only referenced data column is
    * the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    * this formulation also skips caching the full parse. Blank lines
    * are excluded to match the JSON reader, which skips them. */
  def corruptLines(spark: SparkSession, path: String,
                   schema: StructType,
                   corruptCol: String = "_corrupt_record"): DataFrame = {
    val withCorrupt = schema.add(corruptCol, StringType)
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(input_file_name().as("file"), col("value"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> corruptCol)).as("p"))
      .where(col("p").isNull || col(s"p.$corruptCol").isNotNull)
      .select(col("file"), col("value").as("corrupt_line"))
  }
}
