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
    val w = new VarintWriter(sorted.length * 2)
    var i = 0
    while (i < sorted.length) { w.append(sorted(i)); i += 1 }
    w.toArray
  }

  /** Decode back to the ascending ID array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val out = new ArrayBuffer[Long]()
    val c = new VarintCursor(bytes)
    while (c.valid) { out += c.value; c.advance() }
    out.toArray
  }

  /** Streaming merge of two ascending delta-varint streams into one,
    * dropping duplicates — O(|a| + |b|) time, output-sized memory. This is
    * what keeps [[CompressedPostingsAgg]]'s state compressed THROUGH the
    * aggregation: runs combine without ever materializing the ID set.
    */
  def mergeRuns(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ca = new VarintCursor(a)
    val cb = new VarintCursor(b)
    val w = new VarintWriter(a.length + b.length)
    while (ca.valid && cb.valid) {
      val va = ca.value; val vb = cb.value
      if (va < vb) { w.append(va); ca.advance() }
      else if (vb < va) { w.append(vb); cb.advance() }
      else { w.append(va); ca.advance(); cb.advance() }
    }
    while (ca.valid) { w.append(ca.value); ca.advance() }
    while (cb.valid) { w.append(cb.value); cb.advance() }
    w.toArray
  }

  /** Sequential reader over a delta-varint stream: `value` is the current
    * decoded ID while `valid`; `advance()` steps to the next.
    */
  private[functions] final class VarintCursor(bytes: Array[Byte]) {
    private var i = 0
    private var prev = 0L
    var valid = false
    var value = 0L
    advance()
    def advance(): Unit =
      if (i >= bytes.length) valid = false
      else {
        var acc = 0L
        var shift = 0
        var b = 0
        do {
          b = bytes(i); i += 1
          acc |= (b & 0x7fL) << shift
          shift += 7
        } while ((b & 0x80) != 0)
        prev += acc
        value = prev
        valid = true
      }
  }

  /** Append-only delta-varint encoder fed ascending IDs. */
  private[functions] final class VarintWriter(sizeHint: Int) {
    private val out = new ArrayBuffer[Byte](math.max(sizeHint, 16))
    private var prev = 0L
    def append(v: Long): Unit = {
      var delta = v - prev // first delta is the absolute value
      prev = v
      do {
        val b = (delta & 0x7f).toInt
        delta >>>= 7
        out += (if (delta != 0) (b | 0x80).toByte else b.toByte)
      } while (delta != 0)
    }
    def toArray: Array[Byte] = out.toArray
  }
}

/** Aggregation buffer whose state is COMPRESSED while the aggregation
  * runs: absorbed IDs live as a ladder of sorted delta-varint runs
  * (log-structured — a new run is cut from the staging tail and merged
  * with its neighbor whenever it reaches the neighbor's size, so a buffer
  * of n IDs holds O(log n) runs and total run bytes stay O(compressed)),
  * plus a ≤4096-entry staging tail (≤32 KiB). Peak memory is the
  * compressed postings size + a constant — NOT 8 bytes per ID, which is
  * the whole point vs `collect_set` on a billion-ID stop word. Merging
  * runs is the streaming [[PostingsCodec.mergeRuns]]; nothing ever
  * decodes to a full ID array until the caller decodes the result.
  */
final case class PostingsBuffer(
    var runs: List[Array[Byte]], // newest (smallest) first
    var tail: Array[Long],
    var nTail: Int) {

  /** Total state bytes right now — the spec's boundedness hook. */
  def stateBytes: Long = runs.map(_.length.toLong).sum + 8L * tail.length

  private[functions] def add(id: Long): PostingsBuffer = {
    if (nTail == tail.length) {
      if (nTail < PostingsBuffer.TailCap)
        tail = java.util.Arrays.copyOf(tail, math.max(16, nTail * 2))
      else flush()
    }
    tail(nTail) = id
    nTail += 1
    this
  }

  /** Cut the staging tail into a run (sorted, deduped, delta-encoded) and
    * restore the ladder invariant (strictly growing run sizes).
    */
  private[functions] def flush(): Unit = if (nTail > 0) {
    val t = java.util.Arrays.copyOf(tail, nTail)
    java.util.Arrays.sort(t)
    val w = new PostingsCodec.VarintWriter(nTail * 2)
    var i = 0
    while (i < t.length) {
      if (i == 0 || t(i) != t(i - 1)) w.append(t(i))
      i += 1
    }
    runs = w.toArray :: runs
    compact()
    nTail = 0
  }

  private def compact(): Unit =
    while (runs.lengthCompare(2) >= 0 && runs.head.length >= runs.tail.head.length)
      runs = PostingsCodec.mergeRuns(runs.head, runs.tail.head) :: runs.drop(2)

  private[functions] def absorb(other: PostingsBuffer): PostingsBuffer = {
    flush(); other.flush()
    // Rebuild the ladder by feeding the combined runs smallest-first and
    // compacting after each push: a one-shot compact() only fixes the head,
    // so equal-size runs deeper in a pre-sorted list (e.g. [3,5,5,9]) would
    // survive and break the strictly-growing invariant at depth.
    val sorted = (runs ::: other.runs).sortBy(_.length)
    runs = Nil
    sorted.foreach { r => runs = r :: runs; compact() }
    this
  }

  /** The final single delta-varint stream (ascending distinct IDs). */
  private[functions] def result(): Array[Byte] = {
    flush()
    runs match {
      case Nil => Array.emptyByteArray
      case one :: Nil => one
      case many => many.reduceLeft(PostingsCodec.mergeRuns)
    }
  }
}

object PostingsBuffer {
  /** Staging-tail cap: 4096 longs = 32 KiB — the constant in the buffer's
    * O(compressed) + constant memory bound.
    */
  val TailCap = 4096
  def empty: PostingsBuffer =
    PostingsBuffer(Nil, Array.emptyLongArray, 0)
}

/** Typed `Aggregator` (the engine's UDAF surface) producing compressed
  * postings with compressed AGGREGATION STATE: the buffer is
  * [[PostingsBuffer]] — sorted delta-varint runs merged streamingly on
  * `merge`, never a materialized ID set — so per-group memory during the
  * aggregation is O(compressed) + 32 KiB, a true `collect_set` alternative
  * at stop-word scale (not just compressed OUTPUT). Register with
  * `functions.udaf(CompressedPostingsAgg)` for SQL, or use on
  * `Dataset.groupByKey(...).agg(CompressedPostingsAgg.toColumn)`.
  */
object CompressedPostingsAgg extends Aggregator[Long, PostingsBuffer, Array[Byte]] {
  override def zero: PostingsBuffer = PostingsBuffer.empty
  override def reduce(b: PostingsBuffer, a: Long): PostingsBuffer = b.add(a)
  override def merge(b1: PostingsBuffer, b2: PostingsBuffer): PostingsBuffer =
    b1.absorb(b2)
  override def finish(r: PostingsBuffer): Array[Byte] = r.result()
  override def bufferEncoder: Encoder[PostingsBuffer] =
    Encoders.kryo[PostingsBuffer]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
