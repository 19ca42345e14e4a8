package graft.meta

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ItemsSpec extends SparkSpec {

  private def details = {
    val s = spark
    import s.implicits._
    Seq(
      ("RCFD2170", "FFIEC 031", Date.valueOf("2001-01-01"),
        Option(Date.valueOf("2021-01-01")), "N", "Total assets (old)", "F"),
      ("RCFD2170", "FFIEC 031", Date.valueOf("2021-01-01"),
        Option.empty[Date], "N", "Total assets", "F"),
      ("RIAD4340", "FFIEC 031", Date.valueOf("2001-01-01"),
        Option.empty[Date], "N", "Net income", "F")
    ).toDF("item", "reporting_form", "start_date", "end_date",
      "confidentiality", "description", "itemtype")
  }

  test("activeDefinitions keeps only open-ended rows") {
    val active = Items.activeDefinitions(details).collect()
    assert(active.length == 2)
    assert(active.forall(_.isNullAt(details.columns.indexOf("end_date"))))
  }

  test("definitionsAt resolves the effective-dated definition per fact") {
    val s = spark
    import s.implicits._
    val facts = Seq(
      (1L, "RCFD2170", Date.valueOf("2015-06-30")),
      (2L, "RCFD2170", Date.valueOf("2024-03-31")),
      (3L, "RIAD4340", Date.valueOf("2024-03-31"))
    ).toDF("fact_id", "fitem", "fdate")
    val out = Items.definitionsAt(facts, "fitem", "fdate", details)
      .orderBy("fact_id").collect()
    assert(out(0).getAs[String]("description") == "Total assets (old)")
    assert(out(1).getAs[String]("description") == "Total assets")
    assert(out(2).getAs[String]("description") == "Net income")
  }

  test("writeItemPqs round-trips the metadata into the output tree") {
    val tmp = java.nio.file.Files.createTempDirectory("items").toFile
    details.write.parquet(s"$tmp/src_details.parquet")
    details.select("item").distinct()
      .withColumn("mnemonic", expr("substring(item, 1, 4)"))
      .write.parquet(s"$tmp/src_items.parquet")
    val written = Items.writeItemPqs(spark,
      s"$tmp/src_items.parquet", s"$tmp/src_details.parquet", s"$tmp/out")
    assert(written.size == 2)
    assert(spark.read.parquet(written(1)).count() == 3)
  }
}
