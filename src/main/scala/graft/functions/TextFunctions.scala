package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text/vector primitives shared by the dedup, similarity and
  * text-analysis operators. Everything here is built-in Catalyst
  * expressions (codegen'd, no UDFs), and every hash is MD5 — the one hash
  * both the engine and the DuckDB oracle compute bit-identically, which is
  * what makes the dedup pipelines oracle-checkable.
  */
object TextFunctions {

  /** Lowercased alnum word array: split on whitespace, strip non-[a-z0-9]
    * per token (joined, not re-split — reference tokenizer semantics,
    * `/root/reference/src/functions.cpp:39-46`), drop empties.
    */
  def wordsArr(text: Column): Column =
    filter(
      transform(split(lower(text), "\\s+"), t => regexp_replace(t, "[^a-z0-9]", "")),
      w => length(w) > 0)

  /** Whitespace-collapsed, trimmed, lowercased normal form of a document. */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Word n-gram shingles (space-joined) from a word array; documents with
    * fewer than n words fall back to a single whole-document shingle.
    */
  def shingles(words: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(words) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k + 1)): _*))
    when(size(words) >= n, grams).otherwise(array(concat_ws(" ", array_join(words, " "))))
  }

  /** MinHash value for slot `j`: lexicographic min, over the shingle set,
    * of 8 hex chars (32 bits) sliced out of the shingle's digest — slot j
    * reads digest block j/4 at offset (j%4)*8. Block 0 is md5(shingle);
    * block k is md5("<k>|<shingle>") (the same block scheme as the wide
    * SimHash). One digest serves 4 slots, so an 8-hash signature costs TWO
    * md5s per shingle instead of eight — the dominant cost of MinHash at
    * corpus scale. Slot width matters: a 16-bit slot saturates once a
    * document has ~2^16 shingles (the slot minimum concentrates near 0 and
    * unrelated documents collide on band digests), so 32 bits is the
    * narrowest width safe for large-document corpora — saturation moves to
    * ~4B shingles per document. Fixed-width lowercase hex, so string min ==
    * numeric min — and the slicing is verbatim-mirrorable in DuckDB.
    */
  def minhash(shingleSet: Column, j: Int): Column = {
    val block = j / 4
    val pos = (j % 4) * 8 + 1
    array_min(transform(shingleSet, s =>
      substring(if (block == 0) md5(s) else md5(concat(lit(s"$block|"), s)), pos, 8)))
  }

  /** Dot product of two double arrays — native codegen'd expression with
    * sequential accumulation (bit-equal to the
    * `aggregate(zip_with(...))` fold it replaces, ~200x faster; see
    * [[VectorDot]]).
    */
  def dot(a: Column, b: Column): Column = VectorDot(a, b)

  /** L2 norm of a double array. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cast a float array to double (exact) for stable arithmetic. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))
}
