package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FfiecSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    val s = spark
    import s.implicits._
    Seq(input).toDF("x").select(c.as("y")).collect()(0).get(0)
  }

  test("parseFfiecDate parses yyyyMMdd and nulls NA tokens") {
    assert(one(Ffiec.parseFfiecDate(col("x")), "19981231").toString == "1998-12-31")
    for (na <- Seq("", "0", "00000000"))
      assert(one(Ffiec.parseFfiecDate(col("x")), na) == null)
    // invalid month → null, not error (ref: parse silent semantics)
    assert(one(Ffiec.parseFfiecDate(col("x")), "99991399") == null)
    assert(one(Ffiec.parseFfiecDate(col("x")), "garbage") == null)
  }

  test("idZeroNull nulls zero/empty identifiers, trims the rest") {
    assert(one(Ffiec.idZeroNull(col("x")), "0") == null)
    assert(one(Ffiec.idZeroNull(col("x")), "  ") == null)
    assert(one(Ffiec.idZeroNull(col("x")), " 128384 ") == "128384")
  }

  test("pctToProp converts percents, nulls non-percent values") {
    assert(one(Ffiec.pctToProp(col("x")), "28%") == 0.28)
    assert(one(Ffiec.pctToProp(col("x")), "1,250%") == 12.5)
    assert(one(Ffiec.pctToProp(col("x")), "") == null)
    assert(one(Ffiec.pctToProp(col("x")), "28") == null)
  }

  test("naTokenNull nulls empty and CONF cells") {
    assert(one(Ffiec.naTokenNull(col("x")), "CONF") == null)
    assert(one(Ffiec.naTokenNull(col("x")), "") == null)
    assert(one(Ffiec.naTokenNull(col("x")), "12.5") == "12.5")
  }

  test("cleanPorCol snake-cases like the reference, preserving IDRSSD") {
    assert(Ffiec.cleanPorCol("Financial Institution Zip Code") ==
      "financial_institution_zip_code")
    assert(Ffiec.cleanPorCol("IDRSSD") == "IDRSSD")
    assert(Ffiec.cleanPorCol("\" Weird -- Name \"") == "weird_name")
  }

  test("easternToUtc applies the America/New_York offset incl. DST") {
    // January (EST, UTC-5) vs July (EDT, UTC-4)
    assert(one(Ffiec.easternToUtc(col("x")), "2024-01-15T12:00:00").toString ==
      "2024-01-15 17:00:00.0")
    assert(one(Ffiec.easternToUtc(col("x")), "2024-07-15T12:00:00").toString ==
      "2024-07-15 16:00:00.0")
  }
}
