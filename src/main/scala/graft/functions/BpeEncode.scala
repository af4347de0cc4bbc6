package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE APPLY — encode a document's cleaned word array under a LEARNED
  * merge table: `bpe_encode(words)` returns one segmentation (array of
  * subword tokens) per input word, word order preserved.
  *
  * Semantics: per word, REPLAY the merges in learned priority order —
  * for each merge (a, b), one greedy left-to-right fold over the
  * word's current symbols (merge every adjacent (a, b) occurrence,
  * left-most first, exactly the learner's per-round fold in
  * `TextQueries.bpeRoundsFromWords`). A corpus word therefore encodes
  * to PRECISELY the symbol sequence the learner's final symbol table
  * holds for it — the q264 token totals are reproduced by construction
  * — and an unseen word falls out of the same replay (it just shares
  * no pairs with high-rank merges). This is the sequential-replay
  * contract, not the rank-priority-queue encoder some runtimes use;
  * the two agree on training words but can differ on unseen words
  * with interleaved merge applicability, and the replay form is the
  * one the learner's own fold proves correct.
  *
  * Why a custom expression (the [[KeepTokens]] discipline): the HOF
  * formulation would nest `aggregate(...)` once PER MERGE — a 32k-merge
  * vocabulary is 32k chained interpreted fold layers, unplannable. Here
  * the merge table is a constructor literal (vocabulary-sized, shipped
  * once per task inside the serialized expression — the broadcast-by-
  * plan-literal idiom the kmeans/DSIR queries use), the per-word replay
  * is tight imperative Scala over primitive arrays, and a per-task
  * MEMO keyed on the word skips the replay entirely for repeated words
  * — under a Zipf corpus the hit rate approaches 1, so the per-row cost
  * collapses to one hash probe for all but first occurrences. The memo
  * is capacity-capped (2²⁰ distinct words per task) so a pathological
  * vocabulary cannot grow driver-of-OOM state; past the cap the encode
  * still runs, just un-memoized. The expression itself is codegen'd
  * via a reference object (one virtual call per row). NOTE on the hot
  * path's plan shape: q360's fingerprint projection wraps the result
  * in `transform`/`array_join`/`md5` — Spark's higher-order functions
  * are CodegenFallback, so the enclosing Project evaluates interpreted
  * even though this kernel is codegen-capable. Measured, the replay
  * kernel + memo dominate (the apply adds ~0.5 s per 10× at sf1) and
  * the plan stays a zero-shuffle single scan; if the glue ever shows
  * up in a profile, the DocStats/GopherRepetition discipline applies:
  * fuse (n_words, n_bpe_tokens, seg_fp) into one native
  * struct-emitting pass and drop the intermediate nested array.
  *
  * Null contract: NULL words array → NULL; a NULL element encodes to a
  * NULL inner array (callers feed [[TextFunctions.wordsArr]], which
  * never emits nulls — defensive only). Empty word → empty segmentation.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
    }

  @transient private lazy val encoder = new BpeEncode.Encoder(merges)

  override def nullSafeEval(a: Any): Any =
    encoder.encodeAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val enc = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeEncode.Encoder].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $enc.encodeAll($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** The replay engine + per-task memo. One instance per deserialized
    * expression copy (i.e. per task), so the memo needs no cross-task
    * coordination; ConcurrentHashMap is defensive cheap insurance
    * against any runtime that shares a reference array across threads.
    */
  final class Encoder(merges: Seq[(String, String)]) extends Serializable {
    private val lhs: Array[String] = merges.map(_._1).toArray
    private val rhs: Array[String] = merges.map(_._2).toArray

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

    /** Sequential replay: for each merge in learned order, one greedy
      * left-to-right fold (identical recurrence to the learner's
      * `aggregate` step — append, or replace the last symbol with the
      * concatenation when (last, next) equals the merge pair).
      */
    private def encodeWord(word: String): Array[UTF8String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      var syms = new Array[String](word.length)
      var i = 0
      while (i < word.length) {
        syms(i) = String.valueOf(word.charAt(i))
        i += 1
      }
      var r = 0
      while (r < lhs.length) {
        val a = lhs(r); val b = rhs(r); val ab = a + b
        val next = new Array[String](syms.length)
        var len = 0
        var j = 0
        while (j < syms.length) {
          if (len > 0 && next(len - 1) == a && syms(j) == b) {
            next(len - 1) = ab
          } else {
            next(len) = syms(j)
            len += 1
          }
          j += 1
        }
        syms = java.util.Arrays.copyOf(next, len)
        r += 1
      }
      val enc = syms.map(UTF8String.fromString)
      if (memo.size < MemoCap) memo.put(word, enc)
      enc
    }
  }

  def apply(words: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(words), merges))
}
