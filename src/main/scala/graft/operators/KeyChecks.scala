package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks mirroring the reference's integrity gate
  * (ref: /root/reference/R/ffiec_manifest.R:378 check_pk_and_non_null,
  * /root/reference/R/ffiec_make_long_pqs.R:131 assert_no_dups).
  *
  * Both checks are single-shuffle aggregations that only materialize
  * violations (usually zero rows), so they are safe to run inline in a
  * 100 TB pipeline; the NULL scan is one pass with map-side partial
  * counts (no shuffle of data rows at all).
  */
object KeyChecks {

  /** Duplicate key groups: rows per `cols` combination having count>1. */
  def pkViolations(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)

  /** Per-column NULL counts in long form (column, n_na), only columns
    * with at least one NULL. One job, one row of partial aggregates. */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val counted = df.select(
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*)
    counted
      .unpivot(Array.empty, cols.map(col).toArray, "column", "n_na")
      .where(col("n_na") > 0)
  }

  /** True iff `cols` form a non-NULL primary key of `df`. */
  def checkPkAndNonNull(df: DataFrame, cols: Seq[String]): Boolean =
    nullCounts(df, cols).isEmpty && pkViolations(df, cols).isEmpty

  /** Throw if duplicates exist on the key (the reference's hard gate
    * before writing long parquet). */
  def assertNoDups(df: DataFrame, cols: Seq[String]): Unit = {
    val n = pkViolations(df, cols).count()
    require(n == 0, s"Found $n duplicate key groups on {${cols.mkString(", ")}}")
  }
}
