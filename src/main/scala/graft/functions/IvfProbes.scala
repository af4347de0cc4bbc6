package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused IVF cell scorer: for one row vector, score every seed centroid
  * (`negcos_i = 0.0 - dot(v, seed_i) / (nv * ‖seed_i‖)`) and return the
  * `nProbe` best cell ids ordered by (negcos asc, cell asc) — exactly
  * `slice(array_sort(array(struct_0..struct_k)), 1, nProbe).cell` over
  * the per-cell struct columns, in ONE codegen'd expression whose
  * interior is a primitive loop (generated code calls [[compute]] on the
  * plan-constant reference object, so whole-stage spans survive).
  *
  * Why a custom expression: at the production parameterization
  * (`cells ≈ √N`) the composed formulation builds an expression tree of
  * `cells` structs × `dim` literals — thousands of Catalyst nodes per
  * plan at sf1 (224 cells), tens of thousands at sf3 (388) — and
  * allocates + sorts a `cells`-element struct array per row. Measured at
  * the 30× sweep that tree made assignment the dominant cost of q80
  * (60 s at 150k vectors). This expression holds the seed matrix as a
  * plan constant, runs the `cells × dim` multiply-adds as tight JVM
  * loops, and keeps a bounded `nProbe` insertion buffer instead of
  * sorting — the assignment stage is again O(N·√N·d) with a memory-local
  * constant, the plan you'd actually run at 100 TB.
  *
  * Bit-parity contract (oracle-critical): the dot product is the same
  * ascending accumulation as [[VectorDot]] (float elements widened per
  * element); each seed norm is `sqrt(Σ s_j²)` over the same ascending
  * fold — the identical value Catalyst constant-folds `l2norm(lit-array)`
  * to; `negcos` applies the identical operation order
  * `0.0 - (dot / (nv * norm))`; ordering ties break by cell id with
  * `java.lang.Double.compare` semantics (Spark's double ordering).
  * Differentially spec-asserted against the composed formulation.
  *
  * Rows whose vector length differs from the seed dimension — or that
  * carry a null element — yield NULL (the composed form's `vector_dot`
  * null, which would poison the struct comparison, can't occur on the
  * fixed-dim embedding tables this serves).
  */
case class IvfProbes(
    left: Expression,  // the row vector `v` (array<float|double>)
    right: Expression, // its precomputed L2 norm `nv` (double)
    seeds: IndexedSeq[IndexedSeq[Double]],
    nProbe: Int)
    extends BinaryExpression {

  require(seeds.nonEmpty, "ivf_probes requires at least one seed centroid")
  require(nProbe >= 1, "ivf_probes requires nProbe >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probes"

  private lazy val vFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val dim = seeds.head.length
  private lazy val seedArr: Array[Array[Double]] = seeds.map(_.toArray).toArray
  /** sqrt of the ascending self-dot — the exact value `l2norm(c)` folds to. */
  private lazy val seedNorm: Array[Double] = seedArr.map { s =>
    var acc = 0.0
    var j = 0
    while (j < s.length) { acc += s(j) * s(j); j += 1 }
    math.sqrt(acc)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), DoubleType) if lt == DoubleType || lt == FloatType =>
        if (seeds.forall(_.length == dim)) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: ragged seed matrix")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<DOUBLE|FLOAT>, DOUBLE), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(vec: Any, norm: Any): Any =
    compute(vec.asInstanceOf[ArrayData], norm.asInstanceOf[Double])

  /** One-pass probe selection; called from interpreted eval and generated
    * code alike (codegen keeps the seed matrix in this reference object,
    * so whole-stage spans survive — no CodegenFallback interpreter
    * switch). Null on a dimension mismatch.
    */
  def compute(v: ArrayData, nv: Double): ArrayData = {
    if (v.numElements() != dim) return null
    // a null element would read as garbage below; the composed
    // formulation's vector_dot propagates null — match it
    var nc = 0
    while (nc < dim) { if (v.isNullAt(nc)) return null; nc += 1 }
    val cells = seedArr.length
    val topN = math.min(nProbe, cells)
    val bestScore = new Array[Double](topN)
    val bestCell = new Array[Int](topN)
    var filled = 0
    var i = 0
    while (i < cells) {
      val s = seedArr(i)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * s(j)
        j += 1
      }
      val negcos = 0.0 - acc / (nv * seedNorm(i))
      // bounded insertion by (negcos asc, cell asc): strictly-less moves
      // left; equal scores keep the earlier (smaller) cell first because
      // cells arrive in ascending id order
      var pos = if (filled < topN) filled else topN
      while (pos > 0 && java.lang.Double.compare(negcos, bestScore(pos - 1)) < 0)
        pos -= 1
      if (pos < topN) {
        var k = math.min(filled, topN - 1)
        while (k > pos) { bestScore(k) = bestScore(k - 1); bestCell(k) = bestCell(k - 1); k -= 1 }
        bestScore(pos) = negcos
        bestCell(pos) = i
        if (filled < topN) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var k = 0
    while (k < filled) { out(k) = bestCell(k); k += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfProbes", this, classOf[IvfProbes].getName)
    nullSafeCodeGen(ctx, ev, (v, nv) =>
      s"""
         |${ev.value} = $ref.compute($v, $nv);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfProbes =
    copy(left = newLeft, right = newRight)
}

object IvfProbes {
  def apply(v: Column, nv: Column, seeds: Array[Array[Double]], nProbe: Int): Column =
    Bridge.column(IvfProbes(
      Bridge.expression(v), Bridge.expression(nv),
      seeds.map(_.toIndexedSeq).toIndexedSeq, nProbe))
}
