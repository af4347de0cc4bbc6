package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AlnumTokens, AlnumWordCount, AsciiCleanLower, QuantizeInt8, Tokenize, TokenChunks, VectorDot, Winnow, WordNgrams}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions so SQL users get them too —
  *
  *   - `ascii_clean_lower(s)`: the reference tokenizer's clean+lowercase;
  *   - `vector_dot(a, b)`: codegen'd double-array dot product;
  *   - `tokenize(s)`: generator, letters-only reference tokens;
  *   - `alnum_tokens(s)`: generator, positional `[a-z0-9]` tokens;
  *   - `alnum_word_count(s)`: scalar count of the same token stream;
  *   - `word_ngrams(s, n[, distinct])`: generator, word n-grams —
  *     distinct shingles by default; `distinct => false` emits every
  *     occurrence (LM-count mode, no short-doc fallback);
  *   - `winnow(s, k, w)`: generator, winnowed fingerprints;
  *   - `token_chunks(s, size, stride)`: generator, overlapping token
  *     windows with per-chunk md5 fingerprints;
  *   - `quantize_int8(v)`: per-vector int8 quantization stats struct;
  *
  * (generators are used via LATERAL VIEW / table-generating positions).
  * Literal integer arguments are required where noted — they are plan-
  * construction parameters, not per-row inputs.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Programmatic use on an existing session: [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, className, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.SimplifyAsciiCleanLower)
  }
}

object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal INT, got $other")
  }

  private def litBool(e: Expression, fn: String, arg: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a literal BOOLEAN, got $other")
  }

  /** (name, expression class, builder) for every registered native
    * function — the class name feeds DESCRIBE FUNCTION metadata.
    */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ascii_clean_lower", classOf[AsciiCleanLower].getName,
      (es: Seq[Expression]) => AsciiCleanLower(es.head)),
    ("vector_dot", classOf[VectorDot].getName,
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    ("tokenize", classOf[Tokenize].getName,
      (es: Seq[Expression]) => Tokenize(es.head)),
    ("alnum_tokens", classOf[AlnumTokens].getName,
      (es: Seq[Expression]) => AlnumTokens(es.head)),
    ("alnum_word_count", classOf[AlnumWordCount].getName,
      (es: Seq[Expression]) => AlnumWordCount(es.head)),
    ("word_ngrams", classOf[WordNgrams].getName,
      (es: Seq[Expression]) => WordNgrams(es(0), litInt(es(1), "word_ngrams", "n"),
        if (es.length > 2) litBool(es(2), "word_ngrams", "distinct") else true)),
    ("winnow", classOf[Winnow].getName,
      (es: Seq[Expression]) =>
        Winnow(es(0), litInt(es(1), "winnow", "k"), litInt(es(2), "winnow", "w"))),
    ("token_chunks", classOf[TokenChunks].getName,
      (es: Seq[Expression]) =>
        TokenChunks(es(0), litInt(es(1), "token_chunks", "size"),
          litInt(es(2), "token_chunks", "stride"))),
    ("quantize_int8", classOf[QuantizeInt8].getName,
      (es: Seq[Expression]) => QuantizeInt8(es.head)))

  /** Register the engine's SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
