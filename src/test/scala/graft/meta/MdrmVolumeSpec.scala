package graft.meta

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 CI-shape gate for the MDRM build chain (round-4 verdict
  * next-step #6): readMdrm → itemsFromMdrm / itemDetailsFromMdrm →
  * definitionsAt over a LARGER synthesized export with every parse
  * hazard at volume — banner line, quoted multiline descriptions with
  * embedded commas/newlines/escaped quotes, 12/31/9999 open-ended
  * sentinels, blank dates — checked by an order-independent digest the
  * driver computes INDEPENDENTLY from the pre-serialization rows (not
  * from the parsed output), so a quiet parse regression (dropped row,
  * shifted quote state, mis-parsed date) breaks the digest, not just a
  * spot check.
  */
class MdrmVolumeSpec extends SparkSpec {

  private val N = 3000

  // deterministic synthetic export: row i is fully derivable from i
  private case class MRow(mnemonic: String, itemCode: String,
                          startRaw: String, endRaw: String,
                          startDate: Date, endDate: Option[Date],
                          itemName: String, description: String)

  private def mkRows: Seq[MRow] = (0 until N).map { i =>
    val mnemonic = Seq("RCFD", "RCON", "RIAD", "RCFN")(i % 4)
    val itemCode = f"${i / 4}%04d"
    val startYear = 1990 + (i % 30)
    val startDate = Date.valueOf(f"$startYear%04d-01-01")
    val startRaw = s"1/1/$startYear 12:00:00 AM"
    // every 5th row open-ended via the 9999 sentinel; every 17th blank
    val (endRaw, endDate) =
      if (i % 5 == 0) ("12/31/9999 12:00:00 AM", None)
      else if (i % 17 == 0) ("", None)
      else {
        val y = startYear + 5
        (s"6/30/$y 12:00:00 AM", Some(Date.valueOf(f"$y%04d-06-30")))
      }
    val itemName = s"TOTAL ASSETS VARIANT $i FOR FFIEC REPORTING"
    // every 3rd description multiline with an embedded comma; every
    // 7th carries an escaped double quote
    val description =
      if (i % 3 == 0) s"Line one of $i,\ncontinued line"
      else if (i % 7 == 0) s"""He said "exactly $i" here"""
      else s"plain description $i"
    MRow(mnemonic, itemCode, startRaw, endRaw, startDate, endDate,
      itemName, description)
  }

  private def csvQuote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""

  private def writeZip(rows: Seq[MRow]): String = {
    val sb = new StringBuilder
    sb ++= "PUBLIC Micro Data Reference Manual export\n"
    sb ++= "\"Mnemonic\",\"Item Code\",\"Start Date\",\"End Date\",\"Item Name\"," +
      "\"Confidentiality\",\"ItemType\",\"Reporting Form\",\"Description\",\"SeriesGlossary\"\n"
    rows.foreach { r =>
      sb ++= Seq(r.mnemonic, r.itemCode, r.startRaw, r.endRaw, r.itemName,
        "N", r.mnemonic, "031", r.description, "g").map(csvQuote).mkString(",")
      sb ++= "\n"
    }
    val tmp = java.nio.file.Files.createTempDirectory("mdrmvol").toFile
    val zipPath = new java.io.File(tmp, "MDRM.zip").getAbsolutePath
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("MDRM_CSV.csv"))
    zos.write(sb.toString.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    zipPath
  }

  test("MDRM chain digest at volume: parse == independent expectation") {
    val s = spark
    import s.implicits._
    val rows = mkRows
    val mdrm = Items.readMdrm(spark, writeZip(rows))

    // order-independent digest over every parse-dependent field,
    // computed from the parsed frame...
    val got = mdrm
      .select(col("item"), col("start_date").cast("string"),
        col("end_date").cast("string"), col("description"))
      .as[(String, String, String, String)].collect().sorted.toSeq
    // ...and independently from the pre-serialization rows
    val want = rows.map { r =>
      (r.mnemonic + r.itemCode, r.startDate.toString,
        r.endDate.map(_.toString).orNull, r.description)
    }.sorted
    assert(got.size === N)
    assert(got === want)

    // sentinel + blank accounting must be exact
    val nOpen = rows.count(_.endDate.isEmpty)
    assert(mdrm.where(col("end_date").isNull).count() === nOpen.toLong)

    // full chain: typed inventory → metadata tables → effective-dated
    // lookup; every fact dated inside its item's window must resolve
    val typed = rows.take(400)
      .map(r => (r.mnemonic + r.itemCode, "Float64")).toDF("item", "data_type")
    val items = Items.itemsFromMdrm(mdrm, typed)
    assert(items.count() === 400L)
    // case restoration applied across the board (FFIEC is a canonical
    // initialism; the rest of the name sentence-cased)
    val names = items.select("item_name").as[String].collect()
    assert(names.forall(n => n.startsWith("Total assets variant") &&
      n.endsWith("FFIEC reporting")), names.take(3).mkString("; "))

    val dets = Items.itemDetailsFromMdrm(mdrm, typed)
    val facts = rows.take(400).map { r =>
      (r.mnemonic + r.itemCode,
        Date.valueOf(r.startDate.toLocalDate.plusYears(1)))
    }.toDF("item", "fact_date")
    val resolved = Items.definitionsAt(facts, "item", "fact_date",
      dets.where(col("start_date").isNotNull))
    assert(resolved.where(col("description").isNotNull).count() === 400L)
  }
}
