package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-stream operators: tumbling-window aggregation and gap-based
  * sessionization, in both batch form (declarative window functions —
  * fully SQL-expressible, used by the correctness oracle) and streaming
  * form (watermark + flatMapGroupsWithState keyed state).
  *
  * Scale notes: the batch sessionizer is one shuffle on user_id; the
  * streaming sessionizer keeps O(1) state per key (only the open
  * session), with event-time timeout so idle keys are evicted.
  */
object Sessions {

  /** Cross-engine-exact sum of a double column: quantize to
    * DECIMAL(28,4) per element (deterministic for a stored double), sum
    * exactly, emit double — immune to partial-agg merge order. */
  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(28, 4))).cast("double")

  /** Tumbling-window counts/sums per (window, event_type) — the batch
    * twin of the streaming query below; date_trunc keeps window edges
    * engine-portable. */
  def eventWindows(events: DataFrame, unit: String = "hour"): DataFrame =
    events
      .groupBy(date_trunc(unit, col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum(col("value")).as("sum_value"))

  /** Batch gap sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSeconds`. Emits one row
    * per session. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(running))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        decSum(col("value")).as("sum_value"))
  }

  /** Stream-stream inner join: events matched to annotations for the
    * same key arriving within ±`windowSeconds` of the event time. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so each side's buffered state is evicted once the other
    * side's watermark passes — bounded state, the canonical
    * stream-stream enrichment shape (late labels joining a firehose).
    *
    * `events` needs (keyCol, tsCol, …); `annotations` needs
    * (annKeyCol, annTsCol, …). The key columns may share a name (they
    * resolve against their parent frames); NON-key column names should
    * be disjoint or downstream selects must qualify them. */
  def joinStreams(events: DataFrame, keyCol: String, tsCol: String,
                  annotations: DataFrame, annKeyCol: String, annTsCol: String,
                  windowSeconds: Long,
                  watermark: String = "30 seconds",
                  joinType: String = "inner"): DataFrame = {
    val l = events.withWatermark(tsCol, watermark)
    val r = annotations.withWatermark(annTsCol, watermark)
    // left_outer also works here: the watermark + time-bound condition
    // is exactly what Structured Streaming requires to know when an
    // unmatched left row can be emitted with nulls. Columns resolve
    // against their parent frames so a shared key name (keyCol ==
    // annKeyCol) is not AMBIGUOUS_REFERENCE.
    l.join(r,
      l(keyCol) === r(annKeyCol) &&
        r(annTsCol) >= l(tsCol) - expr(s"INTERVAL $windowSeconds SECONDS") &&
        r(annTsCol) <= l(tsCol) + expr(s"INTERVAL $windowSeconds SECONDS"),
      joinType)
  }

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Streaming sessionization with keyed state + event-time timeout.
    * Input must carry a watermark on `ts`. Emits a session when the gap
    * timeout fires. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId,
              new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = e.ts.getTime, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId,
                    new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fMGWS does not pre-filter late rows: a session whose end
              // already trails the watermark would yield a timeout <=
              // watermark, which throws and kills the query. Clamp to
              // watermark+1 so the session closes on the next trigger.
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(wm + 1, s.last + gapSeconds * 1000))
            }
            closed.reverseIterator
          }
      }
  }

  /** Same sessionization on Spark 4's transformWithState — typed
    * ValueState in the RocksDB state store plus explicit event-time
    * timers (replace-on-extend). Requires
    * spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider. Semantics identical to
    * sessionizeStream; the arbitrary-state API is the forward path
    * (fMGWS is maintenance-only upstream). */
  def sessionizeStreamTws(events: Dataset[Event], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** transformWithState processor: one open session per key in a typed
  * ValueState; a session-end timer closes it. Timers are replaced
  * (delete-all + register) whenever new events extend the session, and
  * clamped to watermark+1 like the fMGWS twin. */
class SessionProcessor(gapSeconds: Long)
    extends StatefulProcessor[Long, Sessions.Event, Sessions.SessionOut] {
  import Sessions.{Event, SessionOut, SessionState}

  @transient private var session: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    session = getHandle.getValueState("session",
      Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timers: TimerValues): Iterator[SessionOut] = {
    val sorted = rows.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[SessionOut]
    var cur = if (session.exists()) Some(session.get()) else None
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts.getTime - s.last <= gapSeconds * 1000 =>
          cur = Some(s.copy(last = e.ts.getTime, n = s.n + 1, sum = s.sum + e.value))
        case Some(s) =>
          closed ::= SessionOut(key,
            new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum)
          cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts.getTime, e.ts.getTime, 1, e.value))
      }
    }
    cur.foreach { s =>
      session.update(s)
      // Materialize the timer list before deleting: deleteTimer under a
      // live listTimers() iterator mutates RocksDB timer state the
      // iterator is reading — not guaranteed by the API.
      getHandle.listTimers().toSeq.foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(
        math.max(timers.getCurrentWatermarkInMs() + 1,
          s.last + gapSeconds * 1000))
    }
    closed.reverseIterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[SessionOut] = {
    if (session.exists()) {
      val s = session.get()
      session.clear()
      Iterator.single(SessionOut(key,
        new Timestamp(s.start), new Timestamp(s.last), s.n, s.sum))
    } else Iterator.empty
  }
}
