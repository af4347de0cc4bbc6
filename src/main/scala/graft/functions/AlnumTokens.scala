package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native positional token Generator for the text-pipeline alphabet:
  * every whitespace-delimited token cleaned to lowercase `[a-z0-9]`
  * (joined, not re-split), emitted WITH repetition as `(pos, word)` rows,
  * `pos` 0-based over the surviving words — exactly
  * `posexplode(TextFunctions.wordsArr(text))`, in one byte pass.
  *
  * The HOF formulation it replaces (split→transform→filter→posexplode) is
  * CodegenFallback-interpreted and was the dominant cost of the ranking
  * queries (tf and dl both re-evaluated it). Shares
  * [[WordNgrams.cleanWords]] so the ranking, dedup and fingerprint
  * pipelines tokenize identically.
  */
case class AlnumTokens(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(
    StructField("pos", IntegerType, nullable = false) ::
      StructField("word", StringType, nullable = false) :: Nil)

  override def prettyName: String = "alnum_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val line = child.eval(input).asInstanceOf[UTF8String]
    if (line == null) Nil
    else {
      val words = WordNgrams.cleanWords(line.getBytes)
      val out = new Array[InternalRow](words.length)
      var i = 0
      while (i < words.length) {
        out(i) = InternalRow(i, UTF8String.fromString(words(i)))
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AlnumTokens =
    copy(child = newChild)
}

object AlnumTokens {
  def apply(c: Column): Column = Bridge.column(AlnumTokens(Bridge.expression(c)))
}

/** Count of surviving cleaned words under the SAME byte-wise tokenization
  * as [[AlnumTokens]]/[[WordNgrams.cleanWords]] — a word counts iff it has
  * at least one `[A-Za-z0-9]` byte between whitespace boundaries. One byte
  * pass, no allocation. Exists so ratio queries (q79) can derive their
  * denominator from the same tokenizer as their [[WordNgrams]] numerator:
  * mixing in the Catalyst regex tokenizer (Unicode-aware lowercasing)
  * diverges on the documented exotic mappings (U+0130, U+212A) and could
  * make a distinct/total ratio exceed 1.
  */
case class AlnumWordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "alnum_word_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    AlnumWordCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.AlnumWordCount.count($s)")

  override protected def withNewChildInternal(newChild: Expression): AlnumWordCount =
    copy(child = newChild)
}

object AlnumWordCount {
  def apply(c: Column): Column =
    Bridge.column(AlnumWordCount(Bridge.expression(c)))

  /** One byte pass, no allocation; called from interpreted eval and
    * generated code alike.
    */
  def count(s: UTF8String): Int = {
    val in = s.getBytes
    var count = 0
    var inWord = false
    var i = 0
    while (i <= in.length) {
      val b = if (i < in.length) in(i) else ' '.toByte
      if (b == ' ' || (b >= 9 && b <= 13)) {
        if (inWord) { count += 1; inWord = false }
      } else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
          (b >= 'A' && b <= 'Z')) {
        inWord = true
      }
      i += 1
    }
    count
  }
}
