package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single
  * right row with the greatest `rightTime <= leftTime` for the same
  * key — the canonical operator for joining facts to effective-dated
  * metadata (e.g. FFIEC item definitions valid at a report date) or
  * quotes to trades.
  *
  * Plan shape: an equi-join on the key (so Catalyst shuffles both
  * sides by key — no theta-join blowup), the range predicate applied
  * as a join filter, then a per-left-row argmax via row_number. Match
  * multiplicity is bounded by per-key history depth; for deep
  * histories at 100 TB you'd bucket `rightTime` into coarse epochs and
  * join on (key, epoch) ∪ (key, epoch-1) to cap the fan-out — the
  * declarative shape below stays the same.
  */
object AsOfJoin {

  /** `leftId` must uniquely identify left rows. Right columns appear
    * suffixed as-is; ties on `rightTime` break by the given tiebreak
    * column ascending (deterministic output). */
  def asOf(left: DataFrame, leftKey: String, leftTime: String, leftId: String,
           right: DataFrame, rightKey: String, rightTime: String,
           rightTiebreak: String): DataFrame = {
    val joined = left.join(right,
      left(leftKey) === right(rightKey) && right(rightTime) <= left(leftTime),
      "left")
    // qualify via right(...) so the spec binds correctly even when the
    // two sides share column names (the common as-of case, e.g. both 'ts')
    val w = Window.partitionBy(col(leftId))
      .orderBy(right(rightTime).desc_nulls_last, right(rightTiebreak).asc_nulls_last)
    joined
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Range join: left rows matched to right intervals
    * [startCol, endCol) containing leftTime; NULL end = open-ended
    * (the FFIEC item-details effective-dating convention). */
  def rangeJoin(left: DataFrame, leftKey: String, leftTime: String,
                right: DataFrame, rightKey: String,
                startCol: String, endCol: String): DataFrame =
    left.join(right,
      left(leftKey) === right(rightKey) &&
        right(startCol) <= left(leftTime) &&
        (right(endCol).isNull || left(leftTime) < right(endCol)),
      "left")
}
