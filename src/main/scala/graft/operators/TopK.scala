package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (sim desc, id asc)
  * candidates per group WITH map-side partial aggregation — each
  * partition ships at most k rows per query into the shuffle, so
  * shuffle volume is O(partitions · queries · k) instead of
  * O(corpus · queries). This is what makes brute-force KNN viable at
  * corpus scale; a window-function formulation shuffles every scored
  * row.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2)) // sim desc, id asc

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    trim(buf :+ ((in._2, in._1)))

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  // amortized trim: only sort when the buffer overflows 4k
  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (buf.size <= 4 * k) buf else buf.sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
}
