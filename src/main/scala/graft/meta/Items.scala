package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** FFIEC item metadata helpers (ref: /root/reference/R/ffiec_items.R,
  * ffiec_item_details.R, ffiec_create_item_pqs.R). The reference ships
  * MDRM-derived tables (`ffiec_items`, `ffiec_item_details`) as package
  * data; graft treats them as ordinary parquet inputs — `writeItemPqs`
  * mirrors ffiec_create_item_pqs by copying them into the output tree.
  *
  * Expected schemas:
  *  - items: item, mnemonic, item_code, item_name, data_type
  *  - item_details: item, reporting_form, start_date, end_date,
  *    confidentiality, description, seriesglossary, itemtype
  */
object Items {

  def loadItems(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def loadItemDetails(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Definitions still active (no end_date) — the reference's
    * `filter(item_details, is.na(end_date))` idiom. */
  def activeDefinitions(details: DataFrame): DataFrame =
    details.where(col("end_date").isNull)

  /** Definition in effect for each (item, date) fact — effective-dated
    * range join (broadcast the metadata: it is dimension-scale). */
  def definitionsAt(facts: DataFrame, itemCol: String, dateCol: String,
                    details: DataFrame): DataFrame =
    AsOfJoin.rangeJoin(
      facts, itemCol, dateCol,
      broadcastDetails(details), "item", "start_date", "end_date")

  private def broadcastDetails(details: DataFrame): DataFrame =
    broadcast(details.select(col("item"), col("start_date"), col("end_date"),
      col("reporting_form"), col("itemtype"), col("description")))

  // ---- building the metadata tables from the PUBLIC MDRM export ----
  // (ref: /root/reference/data-raw/ffiec_dict.R — the reference builds
  // its package data from https://www.federalreserve.gov/apps/mdrm/
  // MDRM.zip; graft re-expresses the same pipeline so users can build
  // ffiec_items / ffiec_item_details from the public export instead of
  // needing pre-made parquet.)

  private val mdrmDateFmt = "M/d/yyyy h:mm:ss a"
  private val mdrmSentinelPrefix = "12/31/9999"

  /** Load the MDRM dictionary (MDRM.zip or the bare MDRM_CSV.csv) into
    * a normalized DataFrame: snake_cased columns (same cleaner as POR
    * files), start/end dates parsed `M/d/yyyy h:mm:ss a` with the
    * 12/31/9999 open-ended sentinel → NULL, and `item` =
    * mnemonic || item_code prefixed (ref: ffiec_dict.R).
    *
    * The export is metadata-scale (tens of MB for the Fed's whole
    * dictionary), so the member is extracted driver-side — minus the
    * banner line above the header — into a temp file that Spark's
    * multiLine CSV reader parses (quoted embedded commas/newlines). */
  def readMdrm(spark: SparkSession, path: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempFile("mdrm", ".csv")
    val in: java.io.InputStream =
      if (path.toLowerCase.endsWith(".zip")) {
        val zin = new java.util.zip.ZipInputStream(
          new java.io.BufferedInputStream(new java.io.FileInputStream(path)))
        val found = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
          .exists(e => e.getName.toLowerCase.endsWith(".csv"))
        require(found, s"no CSV member in $path")
        zin
      } else new java.io.BufferedInputStream(new java.io.FileInputStream(path))
    try {
      // drop the banner line above the real header (ref skip = 1)
      var b = in.read()
      while (b != -1 && b != '\n') b = in.read()
      java.nio.file.Files.copy(in, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally in.close()
    val raw = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(tmp.toString)
    val renamed = raw.columns.foldLeft(raw)((df, c) =>
      df.withColumnRenamed(c, graft.functions.Ffiec.cleanPorCol(c)))
    def pDate(c: String): Column =
      when(col(c).isNull || trim(col(c)) === "" ||
        col(c).startsWith(mdrmSentinelPrefix), lit(null).cast("date"))
        .otherwise(try_to_timestamp(col(c), lit(mdrmDateFmt)).cast("date"))
    renamed
      .withColumn("start_date", pDate("start_date"))
      .withColumn("end_date", pDate("end_date"))
      .withColumn("item", concat(col("mnemonic"), col("item_code")))
  }

  // The reference's canonical-term restoration after sentence-casing
  // item names (ref: ffiec_dict.R canonical_initialisms — acronyms,
  // schedule codes and protected phrases forced back to their
  // canonical capitalization at token boundaries).
  private val canonicalInitialisms = Seq(
    "HCs", "ASU", "SSFA", "MMDA", "MMDAs", "ACH", "FDIC", "CECL",
    "PPP", "PPPLF", "Federal Reserve", "CMO", "CMOs", "REMICs", "MBS",
    "FR Y-9C", "FFIEC", "FNMA", "FHLMC", "GNMA", "LEI",
    "Tier 1", "Tier 2", "MSAs", "Puerto Rico",
    "Schedule RC-E",
    "Schedule RC-Q", "RC-Q", "RC-C", "Schedule RC",
    "Schedule HC", "Schedule HC-L", "Schedule RI",
    "DTAs", "DTLs",
    "GCE", "GCEs", "IBF", "MBA", "FHLB", "IRAs", "Keogh",
    "Federal Deposit Insurance Act",
    "Federal Deposit Insurance Commission",
    "Federal Regulation K",
    "Federal Regulation D",
    "Federal Reserve Act",
    "Home Owners' Loan Act",
    "Federal Home Loan Bank",
    "HOLA", "QTL", "GAAP",
    "Internal Revenue Service",
    "Domestic Building and Loan Association",
    "IRS", "DBLA",
    "Federal")
  private val lowerWords = Seq("addressees")

  /** The reference's item-name case pipeline as a pure Column
    * expression chain: sentence case → U.S. restore → canonical
    * initialisms at token boundaries → forced-lowercase words.
    * Dimension-scale input, so the ~60 stacked regexp_replace nodes
    * cost analysis time only once. */
  def fixItemNameCase(c: Column): Column = {
    val sentence = when(c.isNull, c).otherwise(
      concat(upper(c.substr(lit(1), lit(1))), lower(c.substr(lit(2), length(c)))))
    val us = regexp_replace(sentence,
      "(?i)(?<![A-Za-z0-9_])((?:non-)?)u\\.s\\.(?![A-Za-z0-9_])", "$1U.S.")
    val withInitialisms = canonicalInitialisms.foldLeft(us) { (acc, term) =>
      val pat = "(?i)(?<![A-Za-z0-9_])" +
        java.util.regex.Pattern.quote(term.toLowerCase) + "(?![A-Za-z0-9_])"
      regexp_replace(acc, pat, java.util.regex.Matcher.quoteReplacement(term))
    }
    lowerWords.foldLeft(withInitialisms) { (acc, w) =>
      regexp_replace(acc, s"(?i)\\b$w\\b", w)
    }
  }

  /** `ffiec_items`: the typed item inventory (item, data_type — the
    * distinct items of the long tables) joined to MDRM names with the
    * case restoration applied (ref: ffiec_dict.R ffiec_items). */
  def itemsFromMdrm(mdrm: DataFrame, typedItems: DataFrame): DataFrame =
    typedItems.join(mdrm, Seq("item"), "left")
      .select(col("item"), col("mnemonic"), col("item_code"),
        fixItemNameCase(col("item_name")).as("item_name"), col("data_type"))
      .distinct()
      .orderBy("item")

  /** `ffiec_item_details`: effective-dated definition rows per item
    * (ref: ffiec_dict.R ffiec_item_details). Feed the result to
    * [[definitionsAt]] / [[activeDefinitions]]. */
  def itemDetailsFromMdrm(mdrm: DataFrame, typedItems: DataFrame): DataFrame =
    typedItems.join(mdrm, Seq("item"), "left")
      .select(col("item"), col("reporting_form"), col("start_date"),
        col("end_date"), col("confidentiality"), col("description"),
        col("seriesglossary"), col("itemtype"))
      .distinct()
      .orderBy("item", "reporting_form", "start_date")

  /** Write the item metadata tables into the parquet output tree
    * (ref: ffiec_create_item_pqs). */
  def writeItemPqs(spark: SparkSession, itemsPath: String, detailsPath: String,
                   outDir: String, overwrite: Boolean = true): Seq[String] = {
    val mode = if (overwrite) "overwrite" else "errorifexists"
    val outItems = s"$outDir/ffiec_items.parquet"
    val outDetails = s"$outDir/ffiec_item_details.parquet"
    loadItems(spark, itemsPath).write.mode(mode).parquet(outItems)
    loadItemDetails(spark, detailsPath).write.mode(mode).parquet(outDetails)
    Seq(outItems, outDetails)
  }
}
