package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k per group as a typed `Aggregator` (the `TypedColumn` tier of the
  * custom-operator ladder).
  *
  * The usual Spark idiom — `row_number().over(Window.partitionBy(g).orderBy(v))`
  * then `filter(rn <= k)` — shuffles and sorts *every* row of every group. This
  * aggregator keeps at most `k` (value, tag) pairs per partial buffer, so the
  * shuffle carries `k · numPartitions · numGroups` elements instead of the whole
  * table, and merge is an O(k) sorted-merge — the right shape for "top 10 per
  * key over 100 TB".
  *
  * Ordering: value DESC, then tag ASC — total order ⇒ deterministic output.
  * Buffers are kept sorted, inserts prune immediately, so memory is O(k).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by { case (v, tag) => (-v, tag) } // value desc, tag asc

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    insert(buf, in)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && ord.gteq(in, buf.last)) buf
    else {
      val (before, after) = buf.span(ord.lt(_, in))
      (before ::: in :: after).take(k)
    }
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** Untyped column form: `groupBy(g).agg(top_k(k)(valueCol, tagCol))` →
    * array<struct<_1: double, _2: bigint>> of the k largest values with tags. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
}
