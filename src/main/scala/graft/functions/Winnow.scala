package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03 — "Winnowing: Local Algorithms for Document
  * Fingerprinting"): k-gram ROLLING hash over the normalized character
  * stream, then the rightmost minimum of each w-hash window, deduplicated.
  * Guarantees: any shared substring of length >= w + k - 1 produces at
  * least one shared fingerprint, while selecting only ~2/(w+1) of all
  * hashes — the classic near-copy detection fingerprint at corpus scale.
  *
  * Normalization: lowercase `[a-z0-9]` bytes only (same alphabet as the
  * dedup shingles), other bytes dropped.
  *
  * Emitted as a Generator: `(fp BIGINT)` rows, distinct per document.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 2 && w >= 1)

  override def elementSchema: StructType =
    StructType(StructField("fp", LongType, nullable = false) :: Nil)

  override def prettyName: String = "winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val line = child.eval(input).asInstanceOf[UTF8String]
    if (line == null) Nil
    else Winnow.fingerprints(line.getBytes, k, w).map(InternalRow(_))
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {

  private val Base = 1000003L

  /** Distinct winnowed fingerprints of the normalized byte stream. */
  def fingerprints(raw: Array[Byte], k: Int, w: Int): Seq[Long] = {
    // normalize: keep [a-z0-9], fold [A-Z]
    val s = new mutable.ArrayBuffer[Byte](raw.length)
    raw.foreach { b =>
      if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') s += b
      else if (b >= 'A' && b <= 'Z') s += (b + 32).toByte
    }
    val n = s.length
    if (n < k) return if (n == 0) Nil else {
      // degenerate: hash whatever is there so tiny docs still fingerprint
      var h = 0L; s.foreach(b => h = h * Base + (b & 0xffL)); Seq(h)
    }
    // rolling k-gram hashes (wraparound arithmetic — deterministic)
    var pow = 1L
    (1 until k).foreach(_ => pow *= Base)
    val hashes = new Array[Long](n - k + 1)
    var h = 0L
    (0 until k).foreach(i => h = h * Base + (s(i) & 0xffL))
    hashes(0) = h
    var i = k
    while (i < n) {
      h = (h - (s(i - k) & 0xffL) * pow) * Base + (s(i) & 0xffL)
      hashes(i - k + 1) = h
      i += 1
    }
    // winnow: rightmost minimum per window of w hashes, dedup consecutive
    val out = mutable.LinkedHashSet.empty[Long]
    if (hashes.length <= w) { out += hashes.min }
    else {
      var start = 0
      var minIdx = -1
      while (start + w <= hashes.length) {
        if (minIdx < start) {
          minIdx = start
          var j = start + 1
          while (j < start + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
        } else {
          val newest = start + w - 1
          if (hashes(newest) <= hashes(minIdx)) minIdx = newest
        }
        out += hashes(minIdx)
        start += 1
      }
    }
    out.toSeq
  }

  def apply(c: Column, k: Int, w: Int): Column =
    Bridge.column(Winnow(Bridge.expression(c), k, w))
}
