package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word SimHash bit mask: bit `i` of the result is the low bit of
  * hex digit `i mod 32` of the word's block digest (block 0 =
  * md5(word), block k = md5("k|word")) — EXACTLY the bit rule of the
  * column formulation in `Dedup.simhash` and its SQL oracles
  * (`instr('0123456789abcdef', substring(md5(w), j+1, 1)) - 1) % 2`),
  * computed in one pass over the digest bytes instead of `bits`
  * string-probing expressions per word. The per-document signature
  * aggregation then sums mask bits: with S_b = Σ bit b over W distinct
  * words, the ±1 vote total is 2·S_b − W, so the signature bit is
  * `2·S_b > W` — identical to the vote-column form (differential
  * spec in DedupSpec pins bit equality against the long format).
  */
case class SimhashBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "simhash_bits supports 1..64 bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  /** Row kernel, also the codegen entry point. */
  def compute(word: UTF8String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val wb = word.getBytes
    var mask = 0L
    var k = 0
    val blocks = (bits + 31) / 32
    while (k < blocks) {
      md.reset()
      if (k > 0) md.update(s"$k|".getBytes("UTF-8"))
      val dg = md.digest(wb)
      val width = math.min(32, bits - k * 32)
      var j = 0
      while (j < width) {
        val nib =
          if (j % 2 == 0) (dg(j / 2) >> 4) & 0xf
          else dg(j / 2) & 0xf
        if ((nib & 1) == 1) mask |= 1L << (k * 32 + j)
        j += 1
      }
      k += 1
    }
    mask
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  // reference-object call (the IvfProbes / ContainsBenchmarkNgram
  // pattern): keeps the mask computation inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shb", this, classOf[SimhashBits].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {
  def apply(c: Column, bits: Int): Column =
    Bridge.column(SimhashBits(Bridge.expression(c), bits))
}
