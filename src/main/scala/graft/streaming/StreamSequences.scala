package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Sequences.episodePairs]]: the
  * gap-constrained episode PAIR STREAM as a watermarked stream-stream
  * interval self-join — the canonical Structured Streaming time-bound
  * join. Each emitted row is one (occurrence-of-a, occurrence-of-b)
  * pair with 0 < t_b − t_a ≤ gap in the same key's stream, exactly the
  * rows the batch operator counts; support aggregation stays with the
  * caller (a windowed count downstream, or the batch twin at rest),
  * because a global running support has no append-mode close.
  *
  * State is bounded by the watermark: each side buffers only rows
  * younger than delay + gap (Spark derives the eviction bound from
  * the join's time-range condition — the textbook interval-join state
  * story). Per-key co-partitioning comes from the equi-join on the
  * key, exactly like the batch plan's one-shuffle-per-side shape.
  */
object StreamSequences {

  case class Ev(u: Long, ts: Timestamp, et: String)

  /** `events` must NOT be watermarked yet — both join sides get their
    * own watermark of `delay` here. Output: (a, b, u, ta, tb), one
    * row per in-gap occurrence pair. */
  def episodePairsStream(events: Dataset[Ev], gapSeconds: Long,
                         delay: String = "30 seconds"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val l = events.toDF().withWatermark("ts", delay).alias("l")
    val r = events.toDF().withWatermark("ts", delay).alias("r")
    l.join(r, expr(
      s"""l.u = r.u AND r.ts > l.ts
         |AND r.ts <= l.ts + INTERVAL $gapSeconds SECOND""".stripMargin))
      .select(col("l.et").as("a"), col("r.et").as("b"),
        col("l.u").as("u"), col("l.ts").as("ta"), col("r.ts").as("tb"))
  }
}
