package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer Generator (the engine's UDTF surface): one pass over
  * the line bytes that fuses the reference's whole inner loop —
  * whitespace split (`fin >> word`, `/root/reference/src/functions.cpp:77`),
  * non-letter deletion + lowercase (`:39-46,81`), and empty-token drop
  * (`:83-84`) — emitting one row per surviving word.
  *
  * Vs the composed built-ins (`explode(split(line, "\\s+"))` →
  * `ascii_clean_lower` → `filter`): no regex engine, no intermediate
  * token array, no post-filter — a single byte loop with one small
  * allocation per emitted word. Whitespace is the C `isspace` set
  * {space, \t, \n, \v, \f, \r}, matching both `>>` and Java's `\s`;
  * non-letter, non-whitespace bytes are skipped WITHIN a token (so
  * `x1y` → `xy`), and multi-byte UTF-8 is stripped byte-wise exactly
  * like C-locale `isalpha`.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("word", StringType, nullable = false) :: Nil)

  override def prettyName: String = "tokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val line = child.eval(input).asInstanceOf[UTF8String]
    if (line == null) Nil
    else {
      val in = line.getBytes
      val out = new ArrayBuffer[InternalRow]()
      var wordStart = -1 // first letter byte of the current word, -1 = none
      var clean = true   // current word has only lowercase letters so far
      var buf: ArrayBuffer[Byte] = null
      var i = 0
      while (i <= in.length) {
        val b = if (i < in.length) in(i) else ' '.toByte // virtual trailing space
        val isWs = b == ' ' || (b >= 9 && b <= 13)
        val lower = b >= 'a' && b <= 'z'
        val upper = b >= 'A' && b <= 'Z'
        if (isWs) {
          // token boundary: emit pending word
          if (buf != null && buf.nonEmpty) {
            out += InternalRow(UTF8String.fromBytes(buf.toArray))
          } else if (buf == null && wordStart >= 0) {
            out += InternalRow(UTF8String.fromBytes(in, wordStart, i - wordStart))
          }
          wordStart = -1; clean = true; buf = null
        } else if (lower || upper) {
          if (clean && lower && buf == null) {
            if (wordStart < 0) wordStart = i // contiguous lowercase run
          } else {
            if (buf == null) {
              buf = new ArrayBuffer[Byte]()
              if (wordStart >= 0) { var k = wordStart; while (k < i) { buf += in(k); k += 1 } }
              wordStart = 0 // mark started
              clean = false
            }
            buf += (if (upper) (b + 32).toByte else b)
          }
        } else {
          // non-letter, non-whitespace: skipped within the token; if we were
          // tracking a contiguous lowercase slice, fall back to buffering
          if (buf == null && wordStart >= 0) {
            buf = new ArrayBuffer[Byte]()
            var k = wordStart; while (k < i) { buf += in(k); k += 1 }
            clean = false
          } else if (buf == null) {
            // token starts with junk; remember that the token has begun
            // (nothing buffered yet, wordStart stays -1 → handled by buf)
          }
        }
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {
  /** Column-level wrapper (use in `select` — plans a Generate). */
  def apply(c: Column): Column =
    Bridge.column(Tokenize(Bridge.expression(c)))
}
