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

/** Element-wise mean of dense vectors with map-side partial sums —
  * the k-means "new centroid" step without ever materializing a cell's
  * vectors in one buffer (collect_list would). */
class VectorAvgAggregator
    extends Aggregator[Seq[Double], (Seq[Double], Long), Seq[Double]] {

  override def zero: (Seq[Double], Long) = (Vector.empty, 0L)

  override def reduce(b: (Seq[Double], Long), v: Seq[Double]): (Seq[Double], Long) =
    (addInto(b._1, v), b._2 + 1)

  override def merge(a: (Seq[Double], Long), b: (Seq[Double], Long)): (Seq[Double], Long) =
    (addInto(a._1, b._1), a._2 + b._2)

  private def addInto(acc: Seq[Double], v: Seq[Double]): Seq[Double] =
    if (acc.isEmpty) v
    else if (v.isEmpty) acc
    else acc.lazyZip(v).map(_ + _)

  override def finish(b: (Seq[Double], Long)): Seq[Double] =
    if (b._2 == 0) b._1 else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Seq[Double], Long)] =
    ExpressionEncoder[(Seq[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VectorAvgAggregator {
  def udaf(): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VectorAvgAggregator,
      ExpressionEncoder[Seq[Double]]())
}
