package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation for (score, id) pairs ordered by
  * (score desc, id asc) — the scale replacement for
  * `row_number().over(Window.partitionBy(q).orderBy(...)) <= k`:
  * the window form shuffles and sorts EVERY candidate row per query
  * (O(|candidates|) network), while this Aggregator keeps a k-bounded
  * buffer, so map-side partial aggregation sends at most k rows per
  * query per partition. Ordering is total (id tie-break), so results
  * are deterministic and identical to the window formulation.
  */
case class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // dedup by id inside the buffer: callers may feed the same candidate
  // several times (multi-probe ANN) with identical scores — deduping here
  // saves the caller a full-width distinct() shuffle
  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.distinctBy(_._2).take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    trim(b :+ a)
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(b1 ++ b2)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)
  // product encoders: buffer/result serialize as array<struct<_1,_2>>,
  // so the output stays a normal DataFrame column (explodable), not a
  // kryo blob
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
