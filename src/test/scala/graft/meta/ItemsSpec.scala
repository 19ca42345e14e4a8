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

  test("readMdrm + itemsFromMdrm rebuild the metadata tables from a public MDRM zip") {
    val s = spark
    import s.implicits._
    // a miniature MDRM.zip: banner line, real-shaped header, quoted
    // fields with embedded comma AND newline, the 12/31/9999 sentinel
    val csv =
      "PUBLIC Micro Data Reference Manual export\n" +
      "\"Mnemonic\",\"Item Code\",\"Start Date\",\"End Date\",\"Item Name\",\"Confidentiality\",\"ItemType\",\"Reporting Form\",\"Description\",\"SeriesGlossary\"\n" +
      "\"RCFD\",\"0010\",\"01/01/1990 12:00:00 AM\",\"12/31/9999 12:00:00 AM\",\"TOTAL ASSETS FOR FFIEC REPORTING\",\"N\",\"RCFD\",\"031\",\"Total assets,\nconsolidated\",\"g1\"\n" +
      "\"RCON\",\"2170\",\"03/31/2001 12:00:00 AM\",\"06/30/2021 12:00:00 AM\",\"CLAIMS ON U.S. ADDRESSEES\",\"Y\",\"RCON\",\"041\",\"Claims desc\",\"g2\"\n"
    val tmp = java.nio.file.Files.createTempDirectory("mdrm").toFile
    val zipPath = new java.io.File(tmp, "MDRM.zip").getAbsolutePath
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("MDRM_CSV.csv"))
    zos.write(csv.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val mdrm = Items.readMdrm(spark, zipPath)
    val byItem = mdrm.collect().map(r => r.getAs[String]("item") -> r).toMap
    assert(byItem.keySet == Set("RCFD0010", "RCON2170"))
    val r1 = byItem("RCFD0010")
    assert(r1.getAs[Date]("start_date") == Date.valueOf("1990-01-01"))
    assert(r1.isNullAt(r1.fieldIndex("end_date"))) // 9999 sentinel → NULL
    assert(r1.getAs[String]("description") == "Total assets,\nconsolidated")
    assert(byItem("RCON2170").getAs[Date]("end_date") == Date.valueOf("2021-06-30"))

    val typed = Seq(("RCFD0010", "Float64"), ("RCON2170", "Float64"),
      ("RCFD9999", "Float64")).toDF("item", "data_type")
    val items = Items.itemsFromMdrm(mdrm, typed).collect()
      .map(r => r.getAs[String]("item") -> r.getAs[String]("item_name")).toMap
    // sentence case + canonical initialism + U.S./lower-word fixes
    assert(items("RCFD0010") == "Total assets for FFIEC reporting", items.toString)
    assert(items("RCON2170") == "Claims on U.S. addressees", items.toString)
    assert(items("RCFD9999") == null) // inventory item missing from MDRM
    val dets = Items.itemDetailsFromMdrm(mdrm, typed)
    assert(dets.columns.toSeq == Seq("item", "reporting_form", "start_date",
      "end_date", "confidentiality", "description", "seriesglossary", "itemtype"))
    assert(dets.where(col("item") === "RCFD0010").count() == 1)
    // the rebuilt details drive the effective-dated lookup end-to-end
    val facts = Seq(("RCON2170", Date.valueOf("2010-06-30"))).toDF("item", "fact_date")
    val hit = Items.definitionsAt(facts, "item", "fact_date",
      dets.where(col("start_date").isNotNull)).collect()(0)
    assert(hit.getAs[String]("description") == "Claims desc")
  }
}
