package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series shaping: most downstream consumers of
  * daily metrics (drift monitors, forecasting features, cohort
  * reports) assume one row per (key, day) — but event-derived
  * aggregates only have rows where events happened. The gap-fill
  * completes the grid and carries values across the holes.
  */
object TimeSeries {

  /** Complete `df` — one row per (`keyCol`, `dateCol`), the caller's
    * pre-aggregated daily frame — to the full key × day grid over the
    * frame's [min, max] date span, then fill the holes: `forward =
    * false` fills with 0 (count-like metrics), `forward = true`
    * carries the last observed value (level-like metrics: balances,
    * totals-to-date); days before a key's first observation stay NULL
    * under forward fill — fabricating a level there would be a lie.
    *
    * Scale shape: the span bounds are ONE collected aggregate (two
    * literals in the plan); the spine is a per-key `sequence` explode
    * — days × keys rows, the size of the OUTPUT, never corpus-shaped;
    * the actuals join is (key, date)-co-keyed; the forward-fill
    * window partitions by key and its group size is bounded by the
    * day span, not the corpus. Output: (keyCol, dateCol, valueCol). */
  def gapFill(df: DataFrame, keyCol: String, dateCol: String,
              valueCol: String, forward: Boolean): DataFrame = {
    val mm = df.agg(min(col(dateCol)).as("mn"), max(col(dateCol)).as("mx"))
      .head()
    require(!mm.isNullAt(0), "gapFill needs at least one dated row")
    val (mn, mx) = (mm.getDate(0), mm.getDate(1))
    val grid = df.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(mn), lit(mx), expr("interval 1 day")))
          .as(dateCol))
    val joined = grid.join(df, Seq(keyCol, dateCol), "left")
    if (forward) {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined.select(col(keyCol), col(dateCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(valueCol))
    } else {
      joined.select(col(keyCol), col(dateCol),
        coalesce(col(valueCol), lit(0L)).as(valueCol))
    }
  }
}
