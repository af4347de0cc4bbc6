package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization stats — the embedding
  * compression step of a 100 TB ANN index (4 bytes/dim float32 →
  * 1 byte/dim + one scale): `scale = max|v_i| / 127`,
  * `q_i = floor(v_i/scale + 0.5)` (half-up, exact in double), and the
  * summary a pipeline checks before committing to the quantized index:
  *
  *   - `scale`: the dequantization factor;
  *   - `q_sum`: Σ q_i — an exact integer checksum of the code vector
  *     (order-independent, so oracle- and partitioning-stable);
  *   - `n_sat`: how many codes hit ±127 (saturation count);
  *   - `max_abs_err`: max_i |q_i·scale − v_i| — the reconstruction
  *     error bound (≤ scale/2 by construction, spec-asserted).
  *
  * All-zero vectors quantize to all-zero codes with scale 0 and error 0.
  * One primitive pass per row (the composed HOF formulation re-evaluates
  * the interpreted `max|v|` fold at every reference site), codegen'd via
  * the [[VectorDot]] static-helper pattern so it never breaks a
  * whole-stage span; float inputs widen per element, every reduction is
  * order-independent (max / exact integer sum), so results are bit-equal
  * to the SQL formulation on both engines — differentially
  * spec-asserted. Returns NULL on a null vector or a null element.
  * Scale shape: a pure projection — no shuffle.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(
    StructField("scale", DoubleType, nullable = false) ::
      StructField("q_sum", LongType, nullable = false) ::
      StructField("n_sat", IntegerType, nullable = false) ::
      StructField("max_abs_err", DoubleType, nullable = false) :: Nil)

  override def nullable: Boolean = true
  override def prettyName: String = "quantize_int8"

  private lazy val elemFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == DoubleType || et == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE|FLOAT>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantizeInt8.stats(input.asInstanceOf[ArrayData], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = graft.functions.QuantizeInt8.stats($v, $elemFloat);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def apply(c: Column): Column = Bridge.column(QuantizeInt8(Bridge.expression(c)))

  /** One-pass quantization stats; called from interpreted eval and
    * generated code alike. Returns null on a null element (the
    * expression surfaces it as a NULL struct).
    */
  def stats(v: ArrayData, elemFloat: Boolean): InternalRow = {
    val n = v.numElements()
    var i = 0
    var amax = 0.0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (elemFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x)
      if (a > amax) amax = a
      i += 1
    }
    if (amax == 0.0) return InternalRow(0.0, 0L, 0, 0.0)
    val scale = amax / 127.0
    var qSum = 0L
    var nSat = 0
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = if (elemFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q = math.floor(x / scale + 0.5).toLong
      qSum += q
      if (q == 127L || q == -127L) nSat += 1
      val err = math.abs(q.toDouble * scale - x)
      if (err > maxErr) maxErr = err
      i += 1
    }
    InternalRow(scale, qSum, nSat, maxErr)
  }
}
