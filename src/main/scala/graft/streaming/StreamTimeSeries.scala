package graft.streaming

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Dataset, Encoders}
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
