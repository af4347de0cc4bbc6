package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping token-window chunker — the context-window splitting step
  * of a training/RAG ingestion pipeline: document text becomes windows
  * of `size` cleaned words starting every `stride` words (stride < size
  * ⇒ adjacent chunks overlap by `size - stride` words), one output row
  * per chunk: `(chunk_id, start_tok, n_tok, chunk_fp)` with `chunk_fp`
  * the md5 of the space-joined window (the join key for chunk-level
  * dedup / provenance). A document with zero surviving words emits no
  * rows; the final chunk may be short (`n_tok < size`).
  *
  * Tokenization is the byte-wise [[WordNgrams.cleanWords]] pass shared
  * by the dedup/ranking pipelines (ASCII-contract caveat documented
  * there), so chunk boundaries agree with every other token-derived
  * statistic. One byte pass + one md5 per chunk, no intermediate array
  * column — the composed HOF formulation (wordsArr → explode sequence →
  * slice → concat_ws → md5) re-evaluates the interpreted tokenizer once
  * per reference site (measured trap, see SCALE.md "Plan-shape trap").
  *
  * Scale shape: a pure Generate over the corpus scan — no shuffle, no
  * state; output volume is `Σ ceil(words/stride)` rows of fixed width.
  */
case class TokenChunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(size >= 1, "token_chunks requires size >= 1")
  require(stride >= 1 && stride <= size,
    "token_chunks requires 1 <= stride <= size (larger strides would drop words)")

  override def elementSchema: StructType = StructType(
    StructField("chunk_id", IntegerType, nullable = false) ::
      StructField("start_tok", IntegerType, nullable = false) ::
      StructField("n_tok", IntegerType, nullable = false) ::
      StructField("chunk_fp", StringType, nullable = false) :: Nil)

  override def prettyName: String = "token_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val line = child.eval(input).asInstanceOf[UTF8String]
    if (line == null) Nil
    else {
      val words = WordNgrams.cleanWords(line.getBytes)
      val n = words.length
      if (n == 0) Nil
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val nChunks = 1 + (n - 1) / stride
        val out = new Array[InternalRow](nChunks)
        var c = 0
        while (c < nChunks) {
          val start = c * stride
          val len = math.min(size, n - start)
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < len) {
            if (j > 0) sb.append(' ')
            sb.append(words(start + j))
            j += 1
          }
          md.reset()
          val digest = md.digest(sb.toString.getBytes("UTF-8"))
          val hex = new Array[Char](32)
          var k = 0
          while (k < 16) {
            hex(2 * k) = Character.forDigit((digest(k) >> 4) & 0xf, 16)
            hex(2 * k + 1) = Character.forDigit(digest(k) & 0xf, 16)
            k += 1
          }
          out(c) = InternalRow(c, start, len, UTF8String.fromString(new String(hex)))
          c += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)
}

object TokenChunks {
  def apply(c: Column, size: Int, stride: Int): Column =
    Bridge.column(TokenChunks(Bridge.expression(c), size, stride))
}
