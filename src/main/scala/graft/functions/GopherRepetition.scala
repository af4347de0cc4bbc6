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

/** Fused per-document REPETITION statistics — the Gopher repetition
  * rules (Rae et al. 2021, "Scaling Language Models: ... Gopher",
  * appendix A1.1) the quality funnel q238 does not cover: a document
  * dominated by a repeated phrase passes every length/TTR gate while
  * being worthless training data. One native pass per document, one
  * output row (the [[DocStats]] Generator discipline — a
  * struct-returning scalar would re-tokenize per projected field),
  * zero shuffles: the statistic is document-local, so the operator is
  * embarrassingly parallel at any corpus size.
  *
  * Emitted masses are EXACT INTEGER character counts over the cleaned
  * `[a-z0-9]` word stream ([[WordNgrams.cleanWords]] — the dedup
  * tokenization), gram character length = its space-joined form:
  *
  *   - `denom`: chars of the space-joined cleaned stream
  *     (Σ word lengths + (n_words − 1)); 0 for an empty document;
  *   - `top{2,3,4}`: max over n-grams g of count(g) · charlen(g) — the
  *     mass of the heaviest n-gram (max of the product, an order-free
  *     deterministic form of Gopher's "fraction of characters in the
  *     most common n-gram": no tie-break on equal counts);
  *   - `dup{5,10}`: Σ over n-grams with count ≥ 2 of
  *     count(g) · charlen(g) — the mass in duplicated n-grams, WITH
  *     repetition (the 5- and 10-gram endpoints of Gopher's 5..10
  *     ladder; intermediate n interpolate and buy little);
  *
  * so the Gopher thresholds (top2 ≤ 0.20, top3 ≤ 0.18, top4 ≤ 0.16,
  * dup5 ≤ 0.15, dup10 ≤ 0.10 of the character mass) become exact
  * integer cross-multiplications downstream — no float division in
  * the gate. A document with fewer than n words has no n-gram: mass 0
  * (never the whole-doc shingle fallback — occurrence semantics,
  * [[WordNgrams]] `distinct = false`). NULL text emits the all-zero
  * row, keeping the operator row-preserving.
  */
case class GopherRepetition(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  import GopherRepetition.{DupNs, TopNs}

  override def elementSchema: StructType = StructType(
    StructField("denom", LongType, nullable = false) +:
      (TopNs.map(n => StructField(s"top$n", LongType, nullable = false)) ++
        DupNs.map(n => StructField(s"dup$n", LongType, nullable = false))))

  override def prettyName: String = "gopher_repetition"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val line = child.eval(input).asInstanceOf[UTF8String]
    val words =
      if (line == null) Array.empty[String]
      else WordNgrams.cleanWords(line.getBytes)
    var denom = 0L
    var wi = 0
    while (wi < words.length) { denom += words(wi).length; wi += 1 }
    if (words.length > 0) denom += words.length - 1
    val out = new Array[Any](1 + TopNs.length + DupNs.length)
    out(0) = denom
    var oi = 1
    TopNs.foreach { n => out(oi) = mass(words, n, top = true); oi += 1 }
    DupNs.foreach { n => out(oi) = mass(words, n, top = false); oi += 1 }
    InternalRow.fromSeq(out.toIndexedSeq) :: Nil
  }

  /** count·charlen over the doc's n-grams: max of the product
    * (`top = true`) or the sum over grams occurring ≥ 2× (`top =
    * false`). One local hash map bounded by the document's own gram
    * count — no state leaves the row.
    */
  private def mass(words: Array[String], n: Int, top: Boolean): Long = {
    if (words.length < n) return 0L
    val counts = mutable.HashMap.empty[String, Int]
    WordNgrams.ngramIterator(words, n, shortDocFallback = false)
      .foreach { g => counts.update(g, counts.getOrElse(g, 0) + 1) }
    var m = 0L
    counts.foreach { case (g, c) =>
      if (top) m = math.max(m, c.toLong * g.length)
      else if (c >= 2) m += c.toLong * g.length
    }
    m
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

object GopherRepetition {
  private[graft] val TopNs = Seq(2, 3, 4)
  private[graft] val DupNs = Seq(5, 10)

  def apply(c: Column): Column =
    Bridge.column(GopherRepetition(Bridge.expression(c)))
}
