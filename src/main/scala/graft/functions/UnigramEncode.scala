package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenizer APPLY: Viterbi-segment
  * each word under a learned piece vocabulary with fixed-point log
  * probabilities — the OTHER production tokenizer family next to
  * [[BpeEncode]]/[[BpeEncodeRanked]] (reference scope: the tokenize
  * stage of `src/functions.cpp:34-63` generalized to subword units).
  *
  * Semantics (shared EXACTLY with the q377 learner's E-step and the
  * DuckDB oracle's recursive-CTE replay — one definition, three
  * surfaces): for a word of n chars, best(0) = 0 and
  *   best(i) = max over j in [max(0, i - maxPieceLen), i) of
  *             best(j) + lp(word[j..i))
  * where lp is the piece's quantized log probability
  * (round(ln(p)·1e9) as a long — integer comparisons, so the argmax
  * is exact, no float drift), an out-of-vocabulary SINGLE char scores
  * the fixed UNK penalty −100·10⁹ (totality on unseen alphabets;
  * never preferred over any real piece, whose lp ≥ ln(1/Σcnt)·10⁹ ≫
  * −100·10⁹ at any corpus size under 2^143 tokens), and longer
  * out-of-vocabulary spans are not candidates. Ties on the score
  * break toward the SMALLEST j (scan j ascending, strict `>` to
  * replace) — the longest final piece — making the segmentation
  * unique and engine-independent.
  *
  * Cost: O(len · maxPieceLen) hash probes per first-seen word,
  * independent of |vocab|; per-task memo ([[BpeEncode]]'s 2²⁰ cap);
  * plan-literal vocab; codegen by reference object. Null contract:
  * identical to [[BpeEncode]].
  */
case class UnigramEncode(child: Expression, vocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
    }

  @transient private lazy val encoder = new UnigramEncode.Encoder(vocab)

  override def nullSafeEval(a: Any): Any =
    encoder.encodeAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj(
      "unigramEncoder", encoder, classOf[UnigramEncode.Encoder].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $enc.encodeAll($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  /** The fixed OOV single-char penalty — also a literal in the q377/q378
    * DuckDB oracles; change in lockstep or not at all.
    */
  val UnkLp: Long = -100000000000L

  /** Viterbi engine + per-task memo (the [[BpeEncode.Encoder]]
    * conventions).
    */
  final class Encoder(vocab: Seq[(String, Long)]) extends Serializable {
    require(vocab.nonEmpty, "unigram_encode: empty vocabulary")
    private val lp: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (p, l) =>
        m.putIfAbsent(p, java.lang.Long.valueOf(l))
      }
      m
    }
    private val maxPieceLen: Int =
      vocab.iterator.map(_._1.length).max

    private val MemoCap = 1 << 20
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

    def encodeAll(words: ArrayData): ArrayData = {
      val n = words.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) =
          if (words.isNullAt(i)) null
          else new GenericArrayData(
            encodeWord(words.getUTF8String(i).toString)
              .asInstanceOf[Array[Any]])
        i += 1
      }
      new GenericArrayData(out)
    }

    private def encodeWord(word: String): Array[UTF8String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val n = word.length
      val best = new Array[Long](n + 1)
      val bp = new Array[Int](n + 1)
      var i = 1
      while (i <= n) {
        var haveBest = false
        var b = 0L
        var bj = 0
        var j = math.max(0, i - maxPieceLen)
        while (j < i) {
          val piece = word.substring(j, i)
          val l = lp.get(piece)
          val score: java.lang.Long =
            if (l != null) l
            else if (i - j == 1) java.lang.Long.valueOf(UnkLp)
            else null
          if (score != null) {
            val tot = best(j) + score.longValue()
            // strict > : the FIRST (smallest-j) maximizer wins ties
            if (!haveBest || tot > b) { haveBest = true; b = tot; bj = j }
          }
          j += 1
        }
        best(i) = b
        bp(i) = bj
        i += 1
      }
      var count = 0
      var k = n
      while (k > 0) { count += 1; k = bp(k) }
      val enc = new Array[UTF8String](count)
      k = n
      var e = count - 1
      while (k > 0) {
        enc(e) = UTF8String.fromString(word.substring(bp(k), k))
        e -= 1
        k = bp(k)
      }
      if (memo.size < MemoCap) memo.put(word, enc)
      enc
    }
  }

  def apply(words: Column, vocab: Seq[(String, Long)]): Column =
    Bridge.column(UnigramEncode(Bridge.expression(words), vocab))
}
