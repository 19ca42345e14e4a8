package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Sequences
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ∘ batch parity for the episode-pair family: the
  * watermarked interval self-join must emit exactly the occurrence
  * pairs that [[Sequences.episodePairs]] counts over the same events.
  */
class StreamSequencesSpec extends SparkSpec {

  // offset from epoch 0: a row whose event time EQUALS the initial
  // watermark (0) is filtered as late before it ever joins
  private def ts(sec: Long) = new Timestamp((3600L + sec) * 1000L)

  // two users, events across two ingestion waves; pairs within 60s
  private val wave1 = Seq(
    StreamSequences.Ev(1L, ts(0), "A"), StreamSequences.Ev(1L, ts(30), "B"),
    StreamSequences.Ev(2L, ts(10), "A"))
  private val wave2 = Seq(
    StreamSequences.Ev(1L, ts(50), "B"), StreamSequences.Ev(1L, ts(120), "C"),
    StreamSequences.Ev(2L, ts(65), "B"), StreamSequences.Ev(2L, ts(71), "C"))

  test("episodePairsStream: streamed pair multiset equals the batch " +
    "operator's support counts, across ingestion waves") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[StreamSequences.Ev]
    val q = StreamSequences.episodePairsStream(input.toDS(),
        gapSeconds = 60L, delay = "5 seconds")
      .writeStream.format("memory").queryName("episode_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(wave1)
      q.processAllAvailable()
      input.addData(wave2)
      q.processAllAvailable()
      // close the watermark so buffered rows can't linger unmatched
      input.addData(Seq(StreamSequences.Ev(9L, ts(10000), "Z")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("episode_pairs")
      .groupBy("a", "b").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val batch = Sequences.episodePairs(
        (wave1 ++ wave2).toDF("u", "ts", "et"), "u", "ts", "et",
        gapSeconds = 60L, minSupport = 1L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(batch.nonEmpty && streamed == batch,
      s"streamed=$streamed batch=$batch")
    // sanity on the hand case: u1 A→B twice, u2 A→B? Δ55 ✓, B→C Δ6 ✓
    assert(streamed(("A", "B")) == 3L, streamed)
    assert(streamed(("B", "C")) == 1L, streamed)
  }
}
