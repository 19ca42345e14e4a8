package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column functions re-expressing the reference's field-level parsing
  * semantics (see /root/reference/R/ffeic_read.R) as codegen-friendly
  * Spark built-ins — no UDFs, so every one of these stays inside
  * whole-stage codegen and survives predicate pushdown analysis.
  */
object Ffiec {

  /** Parse FFIEC `yyyyMMdd` date strings. The tokens `""`, `"0"` and
    * `"00000000"` mean missing; anything unparseable becomes NULL
    * rather than an error (ref: ffeic_read.R:344 parse_ffiec_yyyymmdd_silent).
    */
  def parseFfiecDate(c: Column): Column = {
    val t = trim(c)
    when(t.isin("", "0", "00000000"), lit(null).cast("date"))
      .otherwise(try_to_date(t, "yyyyMMdd"))
  }

  /** Identifier fields where `"0"` or `""` denote a missing identifier
    * (FDIC cert, OCC charter, OTS docket, routing numbers…) become NULL
    * (ref: ffeic_read.R:329 parse_id_zero_na). */
  def idZeroNull(c: Column): Column = {
    val t = trim(c)
    when(t.isin("", "0"), lit(null).cast("string")).otherwise(t)
  }

  /** Percent-encoded strings to numeric proportions: "28%" → 0.28.
    * Values without a trailing % parse to NULL (the reference raises;
    * at 100 TB a poison row must not kill the job — callers can count
    * NULLs instead) (ref: ffeic_read.R:535 pct_to_prop). */
  def pctToProp(c: Column): Column = {
    val t = trim(c)
    val cleaned = regexp_replace(t, "[%,]", "")
    when(t === "" || t.isNull, lit(null).cast("double"))
      .when(t.endsWith("%") && cleaned.rlike("^-?\\d+(\\.\\d+)?$"),
        cleaned.cast("double") / 100.0)
      .otherwise(lit(null).cast("double"))
  }

  /** NA tokens used by schedule TSVs (ref: ffeic_read.R:160 `na = c("", "CONF")`). */
  def naTokenNull(c: Column): Column =
    when(trim(c).isin("", "CONF"), lit(null).cast("string")).otherwise(c)

  /** Normalize a raw header name the way the reference's POR reader does:
    * non-alphanumerics → `_`, squeeze, trim, lowercase, except IDRSSD
    * keeps its casing (ref: ffeic_read.R:502 clean_por_cols). Driver-side
    * (operates on schema strings, not data). */
  def cleanPorCol(name: String): String = {
    val cleaned = name.trim.stripPrefix("\"").stripSuffix("\"")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("_{2,}", "_")
      .replaceAll("^_+|_+$", "")
      .toLowerCase
    if (cleaned == "idrssd") "IDRSSD" else cleaned
  }

  /** Strip surrounding quotes/space from a schedule header cell
    * (ref: ffeic_read.R:523 clean_cols). */
  def cleanCol(name: String): String =
    name.trim.replaceAll("^\"|\"$", "")

  /** Eastern-time timestamp string `yyyy-MM-dd'T'HH:mm:ss` → UTC
    * timestamp (ref: ffeic_read.R:484 POR submission timestamps). */
  def easternToUtc(c: Column): Column =
    to_utc_timestamp(
      try_to_timestamp(trim(c), lit("yyyy-MM-dd'T'HH:mm:ss")),
      "America/New_York")
}
