package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Shared kernel for the product-quantization expressions: the codebook
  * (`m` subspaces × `k` centroids × `dim/m` components) is a plan
  * constant held in the expression reference object, and every distance
  * is the squared L2 over one subspace computed as the ascending fold
  * `acc += (x_i - c_i)·(x_i - c_i)` — the exact operation order a
  * composed `aggregate(zip_with(...))` (and the DuckDB oracle's
  * `list_reduce(list_transform(...))`) produces, so results are
  * bit-reproducible across engines.
  *
  * Why product quantization at all: a 64-dim float vector is 256 bytes;
  * its PQ code is `m` small ints (4 here). At 100 TB of embeddings the
  * code table is what a search fleet can hold in memory — encode once,
  * then answer queries with per-subspace distance TABLE lookups
  * ([[PqDistTable]] builds the m×k table once per query; scoring a
  * candidate is m array reads, independent of the raw dimension).
  * Extended surface (no analog in the reference engine).
  */
private[functions] trait PqKernel {
  def codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]

  @transient protected lazy val m: Int = codebook.length
  @transient protected lazy val k: Int = codebook.head.length
  @transient protected lazy val sub: Int = codebook.head.head.length
  @transient protected lazy val dim: Int = m * sub
  // cb(s)(j) = centroid j of subspace s, flattened for locality
  @transient protected lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  protected def vFloatOf(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Squared L2 between the row vector's subspace `s` slice and centroid
    * `(s, j)` — ascending fold, float elements widened per element.
    */
  protected final def subDist(
      v: ArrayData, vFloat: Boolean, s: Int, j: Int): Double = {
    val c = cb(s)(j)
    val off = s * sub
    var acc = 0.0
    var d = 0
    while (d < sub) {
      val x = if (vFloat) v.getFloat(off + d).toDouble else v.getDouble(off + d)
      val diff = x - c(d)
      acc += diff * diff
      d += 1
    }
    acc
  }

  /** Null contract shared by both expressions: a vector whose length is
    * not m·sub, or with any null element, yields NULL (matches the
    * composed formulation, where `vector_dot` null-propagates).
    */
  protected final def badInput(v: ArrayData): Boolean = {
    if (v.numElements() != dim) return true
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  protected def checkVec(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(et, _) if et == DoubleType || et == FloatType =>
      if (codebook.forall(sp => sp.length == k && sp.forall(_.length == sub)))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$name: ragged codebook")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires ARRAY<DOUBLE|FLOAT>, got ${other.sql}")
  }
}

/** PQ encoder: one row vector → `struct(codes array<int>, err double)`
  * where `codes(s) = argmin_j subDist(v, s, j)` (ties to the lowest j)
  * and `err` is the ascending-s sum of the winning distances — the
  * per-vector quantization error the compression audit reads. One
  * primitive m·k·(dim/m) = k·dim multiply-add loop per row; generated
  * code calls [[compute]] on the plan-constant reference object, so
  * whole-stage codegen spans survive.
  */
case class PqEncode(
    child: Expression,
    codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression with PqKernel {

  require(codebook.nonEmpty && codebook.head.nonEmpty, "pq_encode: empty codebook")

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  @transient private lazy val vFloat = vFloatOf(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, prettyName)

  override def nullSafeEval(vec: Any): Any =
    compute(vec.asInstanceOf[ArrayData])

  def compute(v: ArrayData): InternalRow = {
    if (badInput(v)) return null
    val codes = new Array[Any](m)
    var err = 0.0
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = subDist(v, vFloat, s, 0)
      var j = 1
      while (j < k) {
        val d = subDist(v, vFloat, s, j)
        // strict less: ties keep the earlier (lower) centroid id
        if (java.lang.Double.compare(d, bestD) < 0) { best = j; bestD = d }
        j += 1
      }
      codes(s) = best
      err += bestD
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), err))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = $ref.compute($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqEncode(
      Bridge.expression(v),
      codebook.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}

/** Asymmetric-distance table for one QUERY vector: `dtab(s)(j) =
  * subDist(q, s, j)` as `array<array<double>>` (m × k). Built once per
  * query row — the ADC trade: table build costs k·dim multiply-adds,
  * after which scoring a candidate is m array lookups
  * (`dtab[s][code_s]`), independent of the raw dimension. Every entry
  * is the identical value a direct query↔centroid distance computes
  * (same fold), so the factored scoring stays bit-equal to the
  * unfactored oracle replay.
  */
case class PqDistTable(
    child: Expression,
    codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression with PqKernel {

  require(codebook.nonEmpty && codebook.head.nonEmpty, "pq_dist_table: empty codebook")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_dist_table"

  @transient private lazy val vFloat = vFloatOf(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, prettyName)

  override def nullSafeEval(vec: Any): Any =
    compute(vec.asInstanceOf[ArrayData])

  def compute(v: ArrayData): ArrayData = {
    if (badInput(v)) return null
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val row = new Array[Any](k)
      var j = 0
      while (j < k) { row(j) = subDist(v, vFloat, s, j); j += 1 }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDistTable", this, classOf[PqDistTable].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |${ev.value} = $ref.compute($v);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

object PqDistTable {
  def apply(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqDistTable(
      Bridge.expression(v),
      codebook.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}
