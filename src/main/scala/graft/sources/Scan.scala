package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet corpus scanning with schema evolution, re-expressing
  * `ffiec_scan_pqs(union_by_name = TRUE)` and `ffiec_list_pqs`
  * (ref: /root/reference/R/ffiec_manifest.R:217, ffiec_process.R:622).
  */
object Scan {

  /** Scan a parquet glob, unioning files by column *name* — Spark's
    * `mergeSchema` resolves differing column sets/orders across report
    * dates the way DuckDB's union_by_name does. Missing columns read as
    * NULL; pushdown and pruning still reach every file. */
  def unionByName(spark: SparkSession, glob: String,
                  keepFilename: Boolean = false): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(glob)
    if (keepFilename) df.withColumn("filename", input_file_name()) else df
  }

  /** Union an explicit list of DataFrames by name, tolerating missing
    * columns (the in-memory twin of the glob scan). */
  def unionFramesByName(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "nothing to union")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** One row per written parquet file with parsed (schedule, date) —
    * the reference's `ffiec_list_pqs` (ref: ffiec_process.R:622).
    * `allFiles=false` keeps only `*_YYYYMMDD.parquet` names. Driver-side
    * FS metadata listing (manifest-scale, like the reference). */
  case class PqFile(baseName: String, fullName: String,
                    schedule: String, dateRaw: Option[String])

  private val datedPq = """_(\d{8})\.parquet$""".r

  def listPqs(spark: SparkSession, dataDir: String, prefix: String = "",
              allFiles: Boolean = false): Seq[PqFile] = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(conf)
    val listing =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
    listing
      .map { path =>
        val base = path.getName
        PqFile(base, path.toString, extractSchedule(base, prefix),
          datedPq.findFirstMatchIn(base).map(_.group(1)))
      }
      .filter(f => allFiles || f.dateRaw.isDefined)
      .sortBy(f => (f.schedule, f.dateRaw))
  }

  /** Schedule id from a parquet basename `{prefix}{schedule}_YYYYMMDD
    * .parquet` (ref: ffiec_process.R:656 extract_schedule). */
  def extractSchedule(baseName: String, prefix: String = ""): String = {
    val x = if (prefix.nonEmpty && baseName.startsWith(prefix))
      baseName.substring(prefix.length) else baseName
    x.replaceAll("_\\d{8}\\.parquet$", "")
  }
}
