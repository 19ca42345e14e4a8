package graft.streaming

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the batch daily-metrics chain
  * [[graft.operators.TimeSeries.gapFill]] →
  * [[graft.operators.TimeSeries.rollingSum]] →
  * [[graft.operators.TimeSeries.anomalies]]: per-key daily values on a
  * complete grid, each day carrying its trailing `days`-window rolling
  * sum and (when a baseline exists) its z-score vs the trailing
  * `zDays` window excluding the day itself.
  *
  * Day-close semantics: a (key, day) row is FINAL — it is emitted once
  * the event-time watermark passes the day's end (exactly the
  * append-mode contract a daily tumbling aggregate would have), with
  * per-day sums accumulated in keyed MapState and an event-time timer
  * at the earliest open day's end. Gap days (no events between two
  * observed days) are emitted when the next observed day closes —
  * zero-filled or forward-carried per `forward`, exactly the batch
  * gapFill fill rule. TWO documented edge divergences from batch, both
  * from batch gridding every key over the GLOBAL [min, max] date span:
  * (1) trailing — days after a key's last observation are not emitted
  * (the stream cannot know the key went quiet vs the data being late;
  * disappears for a key once more of its data arrives); (2) leading —
  * a key first observed after the global min starts its streamed grid
  * at its OWN first day, while batch backfills it from the global min
  * (zero rows under zero fill, NULL rows under forward fill — nothing
  * to carry yet). The stream has no global-min concept, so those
  * leading filler rows never stream. Both are spec-pinned
  * (StreamTimeSeriesSpec's late-first-observation case).
  *
  * Exact replay discipline: values are longs, rolling sums are long
  * adds, and the z float math runs in the SAME fixed operation order
  * as the batch operator over the same exact integer window moments —
  * bit-identical rows (StreamTimeSeriesSpec pins streaming == batch).
  *
  * Scale shape: state per key is one ring buffer of max(days−1,
  * zDays) longs plus the open-day map (bounded by watermark delay ÷ 1
  * day); timers are one per key. RocksDB-backed transformWithState —
  * the same posture as [[SessionProcessor]].
  */
object StreamTimeSeries {

  case class Point(key: Long, ts: Timestamp, v: Long)
  case class DayRow(key: Long, day: Date, v: Long,
                    rolling: Long, z_micro: Option[Long])
  case class GridState(lastDay: Long, lastValue: Long, buf: Array[Long])

  /** `points` must carry a watermark on `ts`. `days` is the rolling-sum
    * window (current day inclusive), `zDays` the anomaly baseline
    * (current day exclusive), `minPoints` the minimum baseline size. */
  def dailyGridStream(points: Dataset[Point], days: Int, forward: Boolean,
                      zDays: Int, minPoints: Int): Dataset[DayRow] = {
    require(days >= 1 && zDays >= 2 && minPoints >= 2 && minPoints <= zDays)
    import points.sparkSession.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(
        new DailyGridProcessor(days, forward, zDays, minPoints),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class EwmaRow(key: Long, n: Long, ewma_milli: Long)
  case class EwmaFold(n: Long, e: Long)

  /** Streaming twin of [[graft.operators.TimeSeries.ewmaHalfPerKey]]:
    * the α=1/2 integer fold e ← (e + x) div 2, applied in strict
    * event-time order. Out-of-order arrivals are buffered in MapState
    * (ts → value) and folded only once the watermark passes them — the
    * fold order is then total (unique ts per key, the batch contract),
    * so every emitted running value is a value the batch fold passes
    * through, and the final row per key equals the batch result.
    * Emits one (key, n, ewma_milli) row per fold ADVANCE (not per
    * event): append-mode running updates. State per key: the running
    * (n, e) pair + the watermark-bounded out-of-order buffer. */
  def ewmaStream(points: Dataset[Point]): Dataset[EwmaRow] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(new EwmaProcessor(),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class Occ(key: String, id: Long, ts: Timestamp)
  case class DeltaRow(key: String, d: Long, net: Long)

  /** Streaming twin of [[graft.operators.TimeSeries.slidingDistinct]]:
    * live trailing `days`-day distinct actives per key.
    *
    * The batch operator's range-delta reformulation is what makes a
    * streaming version possible AT ALL: per-day distinct SETS are
    * neither additive nor storable, but each (key, id, day) occurrence
    * contributes a closed-form ±1 day-range once its per-(key, id)
    * PREDECESSOR day is known — and that predecessor is one long of
    * keyed state. A transformWithState processor per (key, id) holds
    * (lastDay, watermark-ordered pending buffer) and emits the delta
    * rows as days close under the watermark; the deltas then ride the
    * [[StreamMonitor]] shard store (cells are additive ⇒ idempotent
    * batchId overwrite, crash-safe compaction, offline readback).
    *
    * Watermark contract: days are folded in event-time order per
    * (key, id); a day arriving after the watermark closed it is
    * DROPPED (standard lateness semantics — the batch operator, which
    * sees all data, is the reconciliation path). Emits from
    * [[slidingDistinctFromStore]] are SPARSE BREAKPOINTS (key, d,
    * n_distinct): the count for window-end day d, valid until the
    * next breakpoint — the batch grid's gap days are the preceding
    * breakpoint's value.
    *
    * `occ` must carry a watermark on `ts`. State per (key, id): one
    * long + the watermark-bounded pending-day buffer. */
  def slidingDistinctStream(occ: Dataset[Occ], days: Int, storeDir: String,
                            checkpointDir: String, compactEvery: Int = 32)
                           (sink: (org.apache.spark.sql.DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(days >= 1, s"need days >= 1, got $days")
    val spark = occ.sparkSession
    import spark.implicits._
    // named imports: functions._ would shadow the `days` parameter
    // with the partition-transform days()
    import org.apache.spark.sql.functions.{col, sum}
    occ
      .groupByKey(o => (o.key, o.id))
      .transformWithState(new SlidingDistinctProcessor(days),
        TimeMode.EventTime(), OutputMode.Append())
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[DeltaRow], batchId: Long) =>
        batch.groupBy(col("key").as("stratum"), col("d").as("v"))
          .agg(sum("net").as("cb"))
          .write.mode("overwrite").parquet(s"$storeDir/b$batchId")
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          StreamMonitor.compactShards(spark, storeDir, s"c$batchId")
        sink(slidingDistinctFromStore(spark, storeDir), batchId)
      }
      .start()
  }

  /** Sparse distinct-count breakpoints from a sliding-distinct store —
    * also the offline entry point: per key, the running prefix of the
    * accumulated range deltas at every delta day. (key, d,
    * n_distinct); d is the epoch day, the value holds until the next
    * row of the key. */
  def slidingDistinctFromStore(spark: SparkSession,
                               storeDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("key").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    StreamMonitor.readStore(spark, storeDir)
      .select(col("stratum").as("key"), col("v").as("d"), col("cb"))
      .withColumn("n_distinct", sum("cb").over(w))
      .select("key", "d", "n_distinct")
  }
}

/** transformWithState processor backing
  * [[StreamTimeSeries.slidingDistinctStream]]: per (key, id), pending
  * days buffer in MapState until the watermark closes them, then the
  * event-time-ordered fold against the lastDay cursor emits each
  * occurrence's ±1 window-end-day range (the batch operator's lag()
  * logic, one group at a time). Duplicate or late days fold to
  * nothing. */
class SlidingDistinctProcessor(days: Int)
    extends StatefulProcessor[(String, Long), StreamTimeSeries.Occ,
      StreamTimeSeries.DeltaRow] {
  import StreamTimeSeries.{DeltaRow, Occ}

  private val DayMs = 86400000L

  @transient private var lastDay: ValueState[Long] = _
  @transient private var pending: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastDay = getHandle.getValueState("lastDay",
      Encoders.scalaLong, TTLConfig.NONE)
    pending = getHandle.getMapState("pending",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  private def retimer(wmMs: Long): Unit = {
    getHandle.listTimers().toSeq.foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    val ds = pending.keys().toSeq
    if (ds.nonEmpty)
      getHandle.registerTimer(math.max(wmMs + 1, (ds.min + 1) * DayMs))
  }

  override def handleInputRows(key: (String, Long), rows: Iterator[Occ],
                               timers: TimerValues): Iterator[DeltaRow] = {
    rows.foreach { o =>
      val d = math.floorDiv(o.ts.getTime, DayMs)
      if (!pending.containsKey(d)) pending.updateValue(d, 1L)
    }
    retimer(timers.getCurrentWatermarkInMs())
    Iterator.empty
  }

  override def handleExpiredTimer(key: (String, Long), timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[DeltaRow] = {
    val wm = timers.getCurrentWatermarkInMs()
    val ready = pending.keys().toSeq.filter(d => (d + 1) * DayMs <= wm).sorted
    val out = Seq.newBuilder[DeltaRow]
    var prev = if (lastDay.exists()) lastDay.get() else Long.MinValue
    ready.foreach { t =>
      if (t > prev) {
        val lo = if (prev == Long.MinValue) t
                 else math.max(t, prev + days)
        out += DeltaRow(key._1, lo, 1L)
        out += DeltaRow(key._1, t + days, -1L)
        prev = t
      }
      pending.removeKey(t)
    }
    if (prev != Long.MinValue) lastDay.update(prev)
    retimer(wm)
    out.result().iterator
  }
}

/** transformWithState processor backing [[StreamTimeSeries.ewmaStream]]:
  * buffered (epochMicros → value) MapState, one timer at the earliest
  * buffered ts, ValueState for the running (n, ewma) fold. */
class EwmaProcessor
    extends StatefulProcessor[Long, StreamTimeSeries.Point, StreamTimeSeries.EwmaRow] {
  import StreamTimeSeries.{EwmaFold => Fold, EwmaRow, Point}

  @transient private var fold: ValueState[Fold] = _
  @transient private var buf: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    fold = getHandle.getValueState("fold", Encoders.product[Fold], TTLConfig.NONE)
    buf = getHandle.getMapState("buf",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  private def retimer(wmMs: Long): Unit = {
    getHandle.listTimers().toSeq.foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    val ts = buf.keys().toSeq
    if (ts.nonEmpty)
      getHandle.registerTimer(math.max(wmMs + 1, ts.min / 1000 + 1))
  }

  override def handleInputRows(key: Long, rows: Iterator[Point],
                               timers: TimerValues): Iterator[EwmaRow] = {
    rows.foreach(p => buf.updateValue(p.ts.getTime * 1000, p.v))
    retimer(timers.getCurrentWatermarkInMs())
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[EwmaRow] = {
    val wmUs = timers.getCurrentWatermarkInMs() * 1000
    val ready = buf.keys().toSeq.filter(_ < wmUs).sorted
    if (ready.isEmpty) { retimer(timers.getCurrentWatermarkInMs()); return Iterator.empty }
    var st = if (fold.exists()) fold.get() else Fold(0L, -1L)
    ready.foreach { ts =>
      val x = buf.getValue(ts)
      st = if (st.n == 0L) Fold(1L, x) else Fold(st.n + 1, (st.e + x) / 2)
      buf.removeKey(ts)
    }
    fold.update(st)
    retimer(timers.getCurrentWatermarkInMs())
    Iterator.single(EwmaRow(key, st.n, st.e))
  }
}

/** transformWithState processor backing
  * [[StreamTimeSeries.dailyGridStream]]: MapState epochDay → open sum,
  * ValueState for the closed-day cursor (last closed day, last value
  * for forward fill, trailing ring buffer), one event-time timer at
  * the earliest open day's end. */
class DailyGridProcessor(days: Int, forward: Boolean,
                         zDays: Int, minPoints: Int)
    extends StatefulProcessor[Long, StreamTimeSeries.Point, StreamTimeSeries.DayRow] {
  import StreamTimeSeries.{DayRow, GridState, Point}

  private val DayMs = 86400000L
  private val bufMax = math.max(days - 1, zDays)

  @transient private var cursor: ValueState[GridState] = _
  @transient private var open: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cursor = getHandle.getValueState("cursor",
      Encoders.product[GridState], TTLConfig.NONE)
    open = getHandle.getMapState("open",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
  }

  private def retimer(wmMs: Long): Unit = {
    getHandle.listTimers().toSeq.foreach(t =>
      getHandle.deleteTimer(t.asInstanceOf[Long]))
    val openDays = open.keys().toSeq
    if (openDays.nonEmpty) {
      val dayEnd = (openDays.min + 1) * DayMs
      getHandle.registerTimer(math.max(wmMs + 1, dayEnd))
    }
  }

  override def handleInputRows(key: Long, rows: Iterator[Point],
                               timers: TimerValues): Iterator[DayRow] = {
    rows.foreach { p =>
      val d = math.floorDiv(p.ts.getTime, DayMs)
      val cur = if (open.containsKey(d)) open.getValue(d) else 0L
      open.updateValue(d, cur + p.v)
    }
    retimer(timers.getCurrentWatermarkInMs())
    Iterator.empty
  }

  /** Close a day: push its grid value through the ring buffer, compute
    * rolling (current + trailing days−1) and z (trailing zDays,
    * current excluded) with the batch operators' float order. */
  private def close(key: Long, day: Long, value: Long,
                    st: GridState): (DayRow, GridState) = {
    val buf = st.buf
    // rolling: last (days-1) closed values + this day's
    val rolling = value + buf.takeRight(days - 1).sum
    // z baseline: last zDays closed values, n >= minPoints, var > 0
    val base = buf.takeRight(zDays)
    val z: Option[Long] =
      if (base.length < minPoints) None
      else {
        val n = base.length
        val s1 = base.sum
        var s2 = 0L
        base.foreach(x => s2 += x * x)
        val mean = s1.toDouble / n
        val ex2 = s2.toDouble / n
        val variance = ex2 - mean * mean
        if (variance > 0.0)
          Some(math.round(1e6 * ((value.toDouble - mean) / math.sqrt(variance))))
        else None
      }
    val nextBuf = (buf :+ value).takeRight(bufMax)
    (DayRow(key, Date.valueOf(java.time.LocalDate.ofEpochDay(day)),
       value, rolling, z),
     GridState(day, value, nextBuf))
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[DayRow] = {
    val wm = timers.getCurrentWatermarkInMs()
    val ready = open.keys().toSeq.filter(d => (d + 1) * DayMs <= wm).sorted
    var st = if (cursor.exists()) cursor.get()
             else GridState(Long.MinValue, 0L, Array.empty)
    val out = Seq.newBuilder[DayRow]
    ready.foreach { d =>
      // fill the grid between the cursor and this observed day
      if (st.lastDay != Long.MinValue) {
        var g = st.lastDay + 1
        while (g < d) {
          val fillV = if (forward) st.lastValue else 0L
          val (row, next) = close(key, g, fillV, st)
          out += row
          st = next
          g += 1
        }
      }
      val (row, next) = close(key, d, open.getValue(d), st)
      out += row
      st = next
      open.removeKey(d)
    }
    cursor.update(st)
    retimer(wm)
    out.result().iterator
  }
}
