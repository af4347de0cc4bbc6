package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) key: bit-interleave of two non-negative dimension
  * values (lower 32 bits each; `a` on even bit positions, `b` on odd) —
  * the multi-dimensional clustering key behind data-skipping layouts:
  * sort/`sortWithinPartitions` by the key and rows close in BOTH
  * dimensions land in the same parquet row groups, so min/max row-group
  * stats prune 2-D predicates (user × time, shard × position) that a
  * single-column sort can only prune on its leading column.
  *
  * Contract: inputs must be in `[0, 2^31)` for the key to order
  * correctly (bit 63 stays clear, so the signed Long order equals the
  * Morton curve order). Values are masked to 32 bits, never rejected —
  * the expression is a pure key, identical on any engine.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKey.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {

  /** Spread the lower 32 bits of `x` onto the even bit positions of a
    * 64-bit word (standard Morton magic-number spread).
    */
  def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** a on even bits, b on odd bits. Called from interpreted eval AND
    * generated code.
    */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def apply(a: Column, b: Column): Column =
    Bridge.column(ZOrderKey(Bridge.expression(a), Bridge.expression(b)))
}
