package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `filter_and_convert`
  * (`/root/reference/src/functions.cpp:39-46`): delete every byte that is
  * not an ASCII letter and lowercase the survivors, joining the remainder
  * (`don't` → `dont`, `Mr.` → `mr`). Byte-wise processing matches the
  * C-locale `isalpha` exactly — multi-byte UTF-8 (curly quotes etc.) is
  * stripped because no UTF-8 continuation byte is in [A-Za-z].
  *
  * Why a custom expression: this sits in the tokenizer's innermost loop
  * (every byte of a 100 TB corpus passes through it). The built-in
  * equivalent `lower(regexp_replace(tok, "[^A-Za-z]", ""))` walks each
  * token through a Java regex engine and two allocations; this is a single
  * branch-per-byte pass with one allocation, participates in whole-stage
  * codegen via [[doGenCode]], and needs no regex compilation per task.
  */
case class AsciiCleanLower(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_clean_lower"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    AsciiCleanLower.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiCleanLower.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiCleanLower =
    copy(child = newChild)
}

object AsciiCleanLower {

  /** Single-pass byte loop; called from both interpreted eval and the
    * generated code. Returns an ASCII-only lowercase UTF8String.
    */
  def clean(s: UTF8String): UTF8String = {
    val in = s.getBytes
    var n = 0
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) n += 1
      i += 1
    }
    if (n == in.length) {
      // all letters: lowercase in place only if needed
      var hasUpper = false
      i = 0
      while (i < in.length && !hasUpper) { if (in(i) >= 'A' && in(i) <= 'Z') hasUpper = true; i += 1 }
      if (!hasUpper) return s
    }
    val out = new Array[Byte](n)
    var j = 0
    i = 0
    while (i < in.length) {
      val b = in(i)
      if (b >= 'a' && b <= 'z') { out(j) = b; j += 1 }
      else if (b >= 'A' && b <= 'Z') { out(j) = (b + 32).toByte; j += 1 }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column-level wrapper. */
  def apply(c: Column): Column =
    Bridge.column(AsciiCleanLower(Bridge.expression(c)))
}
