package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native benchmark-contamination predicate: true iff ANY word `n`-gram
  * of the cleaned text (the [[WordNgrams.cleanWords]] tokenization, the
  * same one the dedup/decontamination pipelines hash) might be in the
  * benchmark Bloom sketch carried as a plan constant.
  *
  * This is the STREAMING-SAFE form of decontamination: a stateless
  * per-row predicate (no generate → regroup, so no aggregation state),
  * usable in any output mode — and in batch it is the predicate-pushdown
  * form of q93's per-doc count. The sketch rides in the plan like q42's
  * seed matrix (a ~3.6 byte/item constant at ~1e-6 fpp — the
  * [[Md5BloomSketch]] md5-position form, so decisions stay
  * oracle-replayable); rows stream through bit tests. False positives
  * can only DROP extra docs — the conservative direction for
  * pre-training hygiene.
  */
case class ContainsBenchmarkNgram(
    child: Expression, bloom: Md5BloomSketch, n: Int)
    extends UnaryExpression {

  require(n >= 1)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_benchmark_ngram"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  /** Row kernel, also the codegen entry point: SAME enumeration the
    * shingle generator runs (shared iterator, incl. the short-doc
    * whole-document fallback), so this predicate can never drift from
    * the batch q78/q93 shingle semantics; the iterator is lazy, so the
    * scan short-circuits on the first hit. Null propagates (the
    * engine-wide native-expression convention — callers that need
    * null-text rows to SURVIVE a filter coalesce explicitly, as
    * StreamingOps.decontaminateOnIngest does).
    */
  def compute(line: UTF8String): Boolean =
    WordNgrams
      .ngramIterator(WordNgrams.cleanWords(line.getBytes), n, shortDocFallback = true)
      .exists(bloom.mightContain)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  // reference-object call (the IvfProbes pattern): the generated code
  // invokes this instance's kernel, so the transient lazy sketch still
  // deserializes once per task and the filter stays inside the
  // whole-stage-codegen span instead of forcing a fallback boundary
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cbn", this, classOf[ContainsBenchmarkNgram].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): ContainsBenchmarkNgram =
    copy(child = newChild)
}

object ContainsBenchmarkNgram {
  def apply(c: Column, bloom: Md5BloomSketch, n: Int): Column =
    Bridge.column(ContainsBenchmarkNgram(Bridge.expression(c), bloom, n))
}

/** Bloom-membership predicate over an ALREADY-shingled string column —
  * the expression form of `bloom.mightContain`, for plans that have
  * the shingle table in hand (q93's per-doc counts). Keeps the filter
  * inside the Tungsten row pipeline: no typed-Dataset deserialization, no
  * broadcast plumbing — the [[Md5BloomSketch]] rides as a plan constant,
  * like [[ContainsBenchmarkNgram]].
  */
case class MightContainString(child: Expression, bloom: Md5BloomSketch)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_string"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  /** Row kernel, also the codegen entry point; null propagates (see
    * [[ContainsBenchmarkNgram.compute]]).
    */
  def compute(s: UTF8String): Boolean =
    bloom.mightContain(s.toString)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mcs", this, classOf[MightContainString].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainString =
    copy(child = newChild)
}

object MightContainString {
  def apply(c: Column, bloom: Md5BloomSketch): Column =
    Bridge.column(MightContainString(Bridge.expression(c), bloom))
}

/** Bloom-membership predicate over a LONG key column — the runtime
  * semi-join-reduction filter (q119): a sketch of the small/filtered
  * join side's keys rides as a plan constant and prunes the big side
  * BEFORE its shuffle, so only matching (+ false-positive) rows cross
  * the exchange; the exact join downstream removes the false positives,
  * making the sketch semantics-neutral. Same reference-object codegen
  * and transient-lazy deserialization as [[MightContainString]].
  */
case class MightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_long"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.sql}")

  /** Row kernel, also the codegen entry point; null propagates. */
  def compute(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mcl", this, classOf[MightContainLong].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainLong =
    copy(child = newChild)
}

object MightContainLong {
  def apply(c: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(MightContainLong(Bridge.expression(c), bloomBytes))
}
