package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
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
