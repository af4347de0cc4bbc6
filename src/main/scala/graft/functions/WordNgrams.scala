package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle Generator: one pass over the line bytes
  * producing the space-joined n-grams of the cleaned word stream
  * (lowercase alnum words — the `[a-z0-9]` tokenization of
  * TextFunctions.wordsArr).
  *
  * Two modes:
  *   - `distinct = true` (default, shingle semantics): per-document
  *     DISTINCT n-grams; documents with fewer than n words emit the
  *     single whole-document shingle, matching TextFunctions.shingles.
  *   - `distinct = false` (occurrence semantics, for LM counts —
  *     q92): EVERY n-gram occurrence in order, and a document with
  *     fewer than n words emits nothing (it has no n-gram).
  *
  * This replaces a four-deep higher-order-function chain
  * (split→transform→filter→shingle-transform→array_distinct→explode),
  * which is interpreted (CodegenFallback) and was the dominant cost of
  * the dedup pipelines. Per-document dedup happens in the generator's
  * hash set — no extra exchange.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1)

  override def elementSchema: StructType =
    StructType(StructField("sh", StringType, nullable = false) :: Nil)

  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val line = child.eval(input).asInstanceOf[UTF8String]
    if (line == null) Nil
    else {
      val words = WordNgrams.cleanWords(line.getBytes)
      val out = mutable.ArrayBuffer.empty[String]
      val seen = if (distinct) mutable.HashSet.empty[String] else null
      if (words.length >= n) {
        var i = 0
        while (i + n <= words.length) {
          val sb = new java.lang.StringBuilder(words(i))
          var k = 1
          while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
          val s = sb.toString
          if (!distinct || seen.add(s)) out += s
          i += 1
        }
      } else if (distinct) {
        out += words.mkString(" ")
      }
      out.iterator.map(s => InternalRow(UTF8String.fromString(s))).toSeq
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  /** Whitespace-split words cleaned to lowercase `[a-z0-9]` (digits kept —
    * the dedup/fingerprint tokenization, unlike the index tokenizer's
    * letters-only rule). Shared with [[ContainsBenchmarkNgram]].
    */
  private[graft] def cleanWords(in: Array[Byte]): Array[String] = {
    val words = mutable.ArrayBuffer.empty[String]
    val buf = new java.lang.StringBuilder
    var i = 0
    while (i <= in.length) {
      val b = if (i < in.length) in(i) else ' '.toByte
      val isWs = b == ' ' || (b >= 9 && b <= 13)
      if (isWs) {
        if (buf.length > 0) { words += buf.toString; buf.setLength(0) }
      } else if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') {
        buf.append(b.toChar)
      } else if (b >= 'A' && b <= 'Z') {
        buf.append((b + 32).toChar)
      }
      i += 1
    }
    words.toArray
  }

  def apply(c: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(c), n))

  def apply(c: Column, n: Int, distinct: Boolean): Column =
    Bridge.column(WordNgrams(Bridge.expression(c), n, distinct))
}
