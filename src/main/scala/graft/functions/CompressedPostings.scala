package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Delta-varint postings compression — the SURVEY §4.3 scale hardening for
  * per-word posting lists: `collect_set` keeps every doc ID as a boxed
  * 8-byte long in aggregation state; at 100 TB a stop-word's postings are
  * billions of IDs and must be compact. Sorted delta-gap + LEB128 varint
  * encodes typical postings in 1-2 bytes per ID (the classic inverted-index
  * layout the reference's `set<int>` cannot approach —
  * `/root/reference/src/functions.hpp:22`).
  */
object PostingsCodec {

  /** Encode an ascending distinct ID array as delta varints. */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](sorted.length * 2)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      var delta = sorted(i) - prev // first delta is the absolute value
      prev = sorted(i)
      do {
        val b = (delta & 0x7f).toInt
        delta >>>= 7
        out += (if (delta != 0) (b | 0x80).toByte else b.toByte)
      } while (delta != 0)
      i += 1
    }
    out.toArray
  }

  /** Decode back to the ascending ID array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val out = new ArrayBuffer[Long]()
    var acc = 0L
    var shift = 0
    var prev = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      acc |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) {
        prev += acc
        out += prev
        acc = 0L; shift = 0
      } else shift += 7
      i += 1
    }
    out.toArray
  }
}

/** Typed `Aggregator` (the engine's UDAF surface) producing compressed
  * postings directly in the aggregation: per-group state is a distinct-ID
  * buffer; finish sorts, delta-encodes, and emits bytes. Register with
  * `functions.udaf(CompressedPostingsAgg)` for SQL, or use on
  * `Dataset.groupByKey(...).agg(CompressedPostingsAgg.toColumn)`.
  */
object CompressedPostingsAgg extends Aggregator[Long, Set[Long], Array[Byte]] {
  override def zero: Set[Long] = Set.empty
  override def reduce(b: Set[Long], a: Long): Set[Long] = b + a
  override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 ++ b2
  override def finish(r: Set[Long]): Array[Byte] =
    PostingsCodec.encode(r.toArray.sorted)
  override def bufferEncoder: Encoder[Set[Long]] =
    Encoders.kryo[Set[Long]]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
