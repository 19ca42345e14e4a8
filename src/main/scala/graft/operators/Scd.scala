package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: fold a CDC stream (upserts +
  * deletes) onto a base table, last writer wins. The inverse
  * direction — collapsing periodic snapshots into effective-dated
  * versions — is [[AsOfJoin.scd2]]; together they round-trip a
  * mutable entity table through an append-only lake.
  */
object Scd {

  /** Apply a CDC log to a base table, last writer wins. `log` carries
    * (key, ts, op, payload…) with `opCol` ∈ {"U", "D"}; `base` rows
    * act as upserts at time −∞ (a log row for a key always beats the
    * base row). Per key the single latest row by (`tsCol`,
    * `tieCols`…) decides: op "D" → the key disappears; op "U" → the
    * log payload replaces the base row. `tieCols` must make the
    * ordering total (e.g. a change-log sequence number) or the merge
    * is nondeterministic.
    *
    * Scale shape: ONE shuffle on key (union → window → filter), no
    * join — the base is just more rows in the same shuffle. At 100 TB
    * the log is typically ≪ base; AQE's skew split handles a hot key
    * (a key updated millions of times) because the window partitions
    * by key alone and row_number needs no full sort beyond each
    * key's group. Payload columns are taken from the winning row
    * verbatim; base and log must share `payloadCols` schemas. */
  def applyChangeLog(base: DataFrame, log: DataFrame, keyCol: String,
                     tsCol: String, opCol: String,
                     payloadCols: Seq[String],
                     tieCols: Seq[String] = Nil): DataFrame = {
    val baseRows = base.select(
      col(keyCol) +: lit(null).cast(log.schema(tsCol).dataType).as(tsCol) +:
        lit("U").as(opCol) +: payloadCols.map(col) ++:
        tieCols.map(c => lit(null).cast(log.schema(c).dataType).as(c)): _*)
    val logRows = log.select(
      col(keyCol) +: col(tsCol) +: col(opCol) +: payloadCols.map(col) ++:
        tieCols.map(col): _*)
    // nulls_first: the base's null ts sorts BEFORE every log ts under
    // a descending order's nulls-last default flipped — make it
    // explicit so base rows only win when no log row exists.
    val ord = (col(tsCol).desc_nulls_last +:
      tieCols.map(c => col(c).desc_nulls_last)) :+ col(opCol).desc
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    baseRows.unionByName(logRows)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col(opCol) =!= "D")
      .select(col(keyCol) +: payloadCols.map(col): _*)
  }
}
