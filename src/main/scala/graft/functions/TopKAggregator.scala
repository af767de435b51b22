package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.2 J / §7.3: the
  * `Aggregator[IN,BUF,OUT]` surface the reference's UDAF-shaped `reduce`
  * maps onto for incremental aggregation).
  *
  * Keeps the k largest values seen, descending. The buffer is a sorted
  * List bounded at k, so partial aggregation ships at most k doubles per
  * group per partition — the same reason TakeOrderedAndProject scales:
  * merge cost is O(k), never O(rows). Register with
  * `org.apache.spark.sql.functions.udaf(new TopKAggregator(k))` for
  * DataFrame/SQL use, or use `.toColumn` on typed Datasets.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
  require(k > 0)

  override def zero: List[Double] = Nil

  override def reduce(buf: List[Double], v: Double): List[Double] = insert(buf, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Double]): Seq[Double] = buf

  private def insert(buf: List[Double], v: Double): List[Double] = {
    // buf is descending and |buf| <= k.
    if (buf.length >= k && v <= buf.last) buf
    else {
      val (hi, lo) = buf.span(_ >= v)
      (hi ::: v :: lo).take(k)
    }
  }

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
