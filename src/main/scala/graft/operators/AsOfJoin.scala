package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (point-in-time) join: for each left row, attach the single
  * right row with the greatest `rightTime <= leftTime` for the same
  * key — the canonical operator for joining facts to effective-dated
  * metadata (e.g. FFIEC item definitions valid at a report date) or
  * quotes to trades. Semantics match DuckDB's `ASOF LEFT JOIN`.
  *
  * Plan shape: the LINEAR union+window merge, not a join. Both sides
  * are tagged and unioned (right rows carry their payload as a
  * struct), then one window per key ordered by (time, side) computes
  * `last(payload, ignoreNulls)` over a rows-frame — each left row
  * reads the most recent right payload at or before its own time.
  * The intermediate is O(|left| + |right|) with exactly one shuffle
  * (the window partitioning), regardless of per-key history depth.
  *
  * The obvious alternative — equi-join on key + range filter +
  * row_number argmax — materializes Σ_k |left_k|·|right_k ≤ t| rows:
  * per-key-quadratic, and the first thing to melt on deep histories
  * (quotes-to-trades at 100 TB). The merge form cannot fan out.
  */
object AsOfJoin {

  /** Least common type for the key/time columns of the two sides, so
    * the tagged union lines up without caller-side casts (mirrors the
    * coercion an equi-join comparison would have applied). */
  private def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else (a, b) match {
      case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) =>
        TimestampType
      case (DateType, t @ (TimestampType | TimestampNTZType)) => t
      case (t @ (TimestampType | TimestampNTZType), DateType) => t
      case (x: NumericType, y: NumericType) =>
        if (x.isInstanceOf[DecimalType] || y.isInstanceOf[DecimalType]) DoubleType
        else {
          val rank: Seq[DataType] =
            Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
          rank(math.max(rank.indexOf(x), rank.indexOf(y)))
        }
      case _ => a
    }

  /** Output: every left row once (left-join semantics), right columns
    * appended with their original names, null when no right row is at
    * or before the left time. Ties on `rightTime` break by
    * `rightTiebreak` ascending (deterministic output). `leftId` is
    * retained for API stability; the merge form no longer needs a
    * unique left id (and, unlike the old argmax form, stays correct
    * even if left ids collide). */
  def asOf(left: DataFrame, leftKey: String, leftTime: String, leftId: String,
           right: DataFrame, rightKey: String, rightTime: String,
           rightTiebreak: String): DataFrame = {
    val kT = widen(left.schema(leftKey).dataType, right.schema(rightKey).dataType)
    val tT = widen(left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    val K = "__graft_asof_k"; val T = "__graft_asof_t"; val S = "__graft_asof_side"
    val TB = "__graft_asof_tb"; val R = "__graft_asof_r"; val M = "__graft_asof_m"
    val rightCols = right.columns.toSeq

    // Right rows with a null key or null time can never match any left
    // row (three-valued comparison semantics) — drop before the union
    // so they can't be swept up by last(...ignoreNulls).
    val rTagged = right
      .where(right(rightKey).isNotNull && right(rightTime).isNotNull)
      .select(
        right(rightKey).cast(kT).as(K),
        right(rightTime).cast(tT).as(T),
        lit(0).as(S),
        right(rightTiebreak).as(TB),
        struct(rightCols.map(c => right(c)): _*).as(R))
    val lTagged = left.select(
      left(leftKey).cast(kT).as(K) +:
        left(leftTime).cast(tT).as(T) +:
        lit(1).as(S) +:
        left.columns.toSeq.map(c => left(c)): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // Order: time asc (null left times first → they match nothing),
    // right before left at equal time (`<=` is inclusive), and among
    // equal-time right rows the SMALLEST tiebreak sorts LAST so
    // last() picks it — matching the old argmax's tiebreak-asc pick.
    val w = Window.partitionBy(col(K))
      .orderBy(col(T).asc_nulls_first, col(S).asc, col(TB).desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(M, last(col(R), ignoreNulls = true).over(w))
      .where(col(S) === 1)
      .select(left.columns.toSeq.map(c => col(c)) ++
        rightCols.map(c => col(M).getField(c).as(c)): _*)
  }

  /** Skew-proof variant of [[asOf]]: the single-key straggler killer.
    * `asOf`'s one window serializes each key onto one task — correct,
    * linear, but a corpus where one key holds most rows (one instrument
    * dominating quotes-to-trades) runs that key on a single core. Here
    * the time axis is cut into `epochs` buckets and the merge runs in
    * two phases:
    *
    *   1. the same union+window merge per (key, epoch) — hot keys now
    *      spread over `epochs` tasks;
    *   2. each epoch's FINAL right payload (computed in the same
    *      WindowExec, full-partition frame) is aggregated to one row
    *      per (key, epoch) — metadata-scale — and a window over that
    *      tiny table ordered by epoch carries the last non-null prior
    *      payload forward; rows whose epoch-local merge found nothing
    *      coalesce to the carried payload.
    *
    * One big-data shuffle total: the (key, epoch) window partitioning
    * is reused by both the epoch-final aggregate and the carry-back
    * join (EnsureRequirements elides their exchanges); the bounds pass
    * that sizes the buckets scans only the time column. Results are
    * identical to [[asOf]] (spec-asserted on hot-key data).
    */
  def asOfBucketed(left: DataFrame, leftKey: String, leftTime: String,
                   leftId: String, right: DataFrame, rightKey: String,
                   rightTime: String, rightTiebreak: String,
                   epochs: Int = 32): DataFrame = {
    require(epochs >= 2, s"epochs must be >= 2, got $epochs")
    val kT = widen(left.schema(leftKey).dataType, right.schema(rightKey).dataType)
    val tT = widen(left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    val K = "__graft_asof_k"; val T = "__graft_asof_t"; val S = "__graft_asof_side"
    val TB = "__graft_asof_tb"; val R = "__graft_asof_r"; val M = "__graft_asof_m"
    val E = "__graft_asof_e"; val F = "__graft_asof_f"; val C = "__graft_asof_c"
    val rightCols = right.columns.toSeq

    val rTagged = right
      .where(right(rightKey).isNotNull && right(rightTime).isNotNull)
      .select(
        right(rightKey).cast(kT).as(K),
        right(rightTime).cast(tT).as(T),
        lit(0).as(S),
        right(rightTiebreak).as(TB),
        struct(rightCols.map(c => right(c)): _*).as(R))
    val lTagged = left.select(
      left(leftKey).cast(kT).as(K) +:
        left(leftTime).cast(tT).as(T) +:
        lit(1).as(S) +:
        left.columns.toSeq.map(c => left(c)): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // Monotone numeric image of the time column (epoch cut points must
    // preserve time order): days for dates, micros for timestamps,
    // the value itself for numerics.
    def toNum(c: Column): Column = tT match {
      case DateType => unix_date(c).cast(DoubleType)
      case TimestampType | TimestampNTZType =>
        unix_micros(c.cast(TimestampType)).cast(DoubleType)
      case _ => c.cast(DoubleType)
    }
    // Bounds pass: column-pruned scan of the time column only.
    val bounds = unioned.agg(
      min(toNum(col(T))).as("mn"), max(toNum(col(T))).as("mx")).collect()(0)
    val epochCol =
      if (bounds.isNullAt(0)) lit(0L)
      else {
        val mn = bounds.getDouble(0); val mx = bounds.getDouble(1)
        val width = math.max((mx - mn) / epochs, java.lang.Double.MIN_NORMAL)
        // null T must stay epoch NULL (least() would skip the null and
        // return the cap, landing null-time rows in the last epoch with
        // a carried payload they must not see)
        when(col(T).isNull, lit(null).cast(LongType))
          .otherwise(least(floor((toNum(col(T)) - lit(mn)) / lit(width)),
            lit(epochs - 1L)).cast(LongType))
      }

    val wBase = Window.partitionBy(col(K), col(E))
      .orderBy(col(T).asc_nulls_first, col(S).asc, col(TB).desc_nulls_first)
    val staged = unioned
      .withColumn(E, epochCol)
      .withColumn(M, last(col(R), ignoreNulls = true)
        .over(wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(F, last(col(R), ignoreNulls = true)
        .over(wBase.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    // F is constant within (key, epoch): one row per group, then the
    // strictly-prior-epoch carry (null-T rows land in epoch NULL, which
    // sorts first and therefore carries nothing — they match nothing,
    // same as asOf).
    val carried = staged
      .groupBy(col(K), col(E))
      .agg(first(col(F)).as(F))
      .withColumn(C, last(col(F), ignoreNulls = true).over(
        Window.partitionBy(col(K)).orderBy(col(E).asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(K), col(E), col(C))
    staged.join(carried, Seq(K, E), "left")
      .where(col(S) === 1)
      .select(left.columns.toSeq.map(c => col(c)) ++
        rightCols.map(c => coalesce(col(M), col(C)).getField(c).as(c)): _*)
  }

  /** SCD2 history builder — the INVERSE of [[rangeJoin]]/[[asOf]]:
    * collapse a snapshot series (one observed attribute tuple per key
    * per observation time) into effective-dated versions
    * [valid_from, valid_to), merging consecutive observations whose
    * attributes are unchanged; `valid_to` is the next version's
    * `valid_from`, NULL for the open current version. This is how the
    * effective-dated metadata tables the reference consumes (item
    * definitions valid over a date range —
    * /root/reference/R/ffiec_item_details.R:1) get BUILT from raw
    * periodic observations.
    *
    * Change detection is null-safe (`IS DISTINCT FROM` semantics), so
    * attribute columns may hold nulls. Plan: one shuffle on the key;
    * the change-flag and running-version windows share the same
    * (key, time) sort, and the final lead() window runs over the
    * collapsed version rows — per-key linear, no fan-out. */
  def scd2(snapshots: DataFrame, keyCols: Seq[String], timeCol: String,
           attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "key and attr columns required")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    val changed = when(attrs <=> lag(attrs, 1).over(w), 0).otherwise(1)
    val versioned = snapshots
      .withColumn("__graft_ver", sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // attrs are constant within a version by construction, so they
    // join the grouping key (A→B→A re-visits stay distinct versions
    // because the running version number differs)
    val collapsed = versioned
      .groupBy((keyCols ++ attrCols).map(col) :+ col("__graft_ver"): _*)
      .agg(min(col(timeCol)).as("valid_from"))
    val wv = Window.partitionBy(keyCols.map(col): _*).orderBy(col("valid_from").asc)
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .drop("__graft_ver")
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

  /** Interval-overlap SELF-join: all pairs of intervals of the same
    * key that overlap (closed intervals: a.start <= b.end AND
    * b.start <= a.end), each unordered pair once (a's id < b's id).
    * The naive plan is the key-equi-join with the overlap predicate
    * residual — correct, but a key whose intervals pile up produces
    * the full n² pair blowup INSIDE one join group even when few
    * pairs actually overlap.
    *
    * This form cuts the time axis into `binDays` buckets and joins on
    * (key, bin): an interval registers in every bin it touches
    * (sequence-explode, output-sized — an interval spanning many bins
    * is itself long), a candidate pair meets only in bins both touch,
    * and the pair dedupes to its FIRST shared bin (both engines
    * compute the same arithmetic first-bin, no distinct needed): one
    * equality predicate more selective than the bare key, same
    * result. Overlap is re-verified exactly on the bin-met
    * candidates, so bins affect pruning only, never semantics.
    *
    * `idCol` must be unique per row. Dates are compared as epoch
    * days; NULL starts/ends are not supported here (close open
    * intervals at a horizon before calling — overlap against +∞
    * pairs a hot key with everything, which is the caller's modeling
    * decision to make explicit). Output: a-side then b-side columns
    * suffixed `_a`/`_b`. */
  def overlapJoin(df: DataFrame, keyCol: String, idCol: String,
                  startCol: String, endCol: String,
                  binDays: Int = 30): DataFrame = {
    require(binDays >= 1, s"binDays must be >= 1, got $binDays")
    val sd = unix_date(col(startCol).cast(DateType))
    val ed = unix_date(col(endCol).cast(DateType))
    val binned = df
      .withColumn("__s", sd).withColumn("__e", ed)
      .withColumn("__bin",
        explode(sequence(expr(s"__s div $binDays"), expr(s"__e div $binDays"))))
    def side(sfx: String) = binned.select(
      col("__bin").as(s"__bin$sfx") +: col("__s").as(s"__s$sfx") +:
        col("__e").as(s"__e$sfx") +:
        df.columns.toSeq.map(c => col(c).as(s"$c$sfx")): _*)
    val a = side("_a")
    val b = side("_b")
    a.join(b,
        col("__bin_a") === col("__bin_b") &&
          col(s"${keyCol}_a") === col(s"${keyCol}_b") &&
          col(s"${idCol}_a") < col(s"${idCol}_b") &&
          col("__s_a") <= col("__e_b") && col("__s_b") <= col("__e_a") &&
          // first shared bin: both intervals live there, and it is the
          // earliest bin both touch — max of the two start-bins.
          col("__bin_a") === greatest(expr(s"__s_a div $binDays"),
            expr(s"__s_b div $binDays")))
      .drop("__bin_a", "__bin_b", "__s_a", "__e_a", "__s_b", "__e_b")
  }
}
