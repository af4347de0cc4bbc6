package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, n-gram Jaccard, SimHash. Extended surface
  * (no analog in the reference, which only dedups (word, doc) pairs —
  * `/root/reference/src/functions.cpp:86`).
  *
  * Scale design, common to all of them:
  *   - candidate generation is always a *key-equality join* (LSH band
  *     value, shared shingle, SimHash band) — never a cross join, so the
  *     shuffle is on a high-cardinality key and AQE handles skew;
  *   - per-document state (shingle sets, signatures) is built with array
  *     expressions inside one narrow projection — no extra shuffle;
  *   - verification (exact Jaccard) runs only on the candidate set.
  */
object Dedup {

  /** (id, shingle set). The word array is materialized into its own
    * projection first: `shingles` references it O(n) times via
    * `element_at`, and an inlined `wordsArr` expression would be
    * re-evaluated (regex included) on every access — higher-order-function
    * lambdas defeat common-subexpression elimination.
    */
  private def withShingles(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), wordsArr(col(textCol)).as("w"))
      .select(col(idCol), array_distinct(shingles(col("w"), n)).as("sh_set"))

  /** Distinct (id, shingle) pairs.
    *
    * Plan-shape note: the shingle array is exploded as an EXPRESSION on
    * top of the materialized word array, not first aliased to a column.
    * Exploding an aliased attribute triggers InferFiltersFromGenerate,
    * which synthesizes `size(...) > 0` with the whole (CodegenFallback)
    * expression chain inlined several times and pushes it into the scan —
    * measured ~8x slower than this shape at sf0.1.
    */
  def shinglePairs(docs: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame =
    docs
      .select(col(idCol), wordsArr(col(textCol)).as("w"))
      .select(col(idCol), explode(array_distinct(shingles(col("w"), n))).as("sh"))

  /** Exact dedup: group documents by the md5 of their whitespace-normalized
    * text; one row per distinct content with the keeper (min id) and copy
    * count. Scale: one hash-partitioned aggregation on the 128-bit
    * fingerprint — the canonical 100 TB exact-dedup plan.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), md5(normText(col(textCol))).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: `numHashes` md5-minima per document over its
    * shingle set, as one array column `sig`.
    */
  def minhashSignatures(
      docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int, shingleN: Int = 3): DataFrame =
    withShingles(docs, textCol, idCol, shingleN)
      .select(
        col(idCol),
        array((0 until numHashes).map(j => minhash(col("sh_set"), j)): _*).as("sig"))

  /** LSH candidate pairs (idA < idB): documents whose signatures agree on
    * at least one band of `rowsPerBand` consecutive hashes. The join key is
    * (band index, band digest) — pure equality, shuffle-partitioned, no
    * cross product anywhere.
    */
  def lshCandidates(signatures: DataFrame, idCol: String, rowsPerBand: Int): DataFrame = {
    val bands = signatures.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), (size(col("sig")) / rowsPerBand).cast("int") - 1),
          b => md5(concat_ws("|", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*))))
        .as(Seq("band", "digest")))
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("digest"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("digest"))
    a.join(b, Seq("band", "digest"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard for a (small, LSH-pruned) set of candidate pairs:
    * |A∩B| via joining the candidates to both shingle sets. Correct join
    * order depends on candidate volume — this candidate-first shape is
    * right when LSH prunes hard (its contract with rowsPerBand >= 2);
    * [[ngramJaccard]] uses the self-join-first shape for the exhaustive
    * case. Emits (id_a, id_b, jaccard) rounded to 6dp.
    */
  def jaccardVerify(
      candidates: DataFrame,
      shingles: DataFrame, // (id, sh) distinct
      idCol: String): DataFrame = {
    val sizes = shingles.groupBy(col(idCol).as("id")).agg(count(lit(1)).as("n"))
    val s1 = shingles.select(col(idCol).as("id_a"), col("sh"))
    val s2 = shingles.select(col(idCol).as("id_b"), col("sh"))
    candidates
      .join(s1, "id_a").join(s2, Seq("id_b", "sh"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .select(
        col("id_a"), col("id_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
  }

  /** All-pairs n-gram Jaccard above a threshold, candidate-generated by the
    * shared-shingle equi-join (any pair with J > 0 shares a shingle, so
    * this is exact, not approximate). Scale guard: shingles occurring in
    * more than `maxShingleDf` documents can be dropped by callers to bound
    * the per-key join fan-out (stop-shingle removal).
    */
  def ngramJaccard(
      docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    // persisted: referenced three times (both join sides + sizes); without
    // it the shingle expression pipeline is re-evaluated per reference
    val sh = shinglePairs(docs, textCol, idCol, shingleN).persist()
    val sizes = sh.groupBy(col(idCol).as("id")).agg(count(lit(1)).as("n"))
    // one self-join pass: per-shingle fan-out is C(df, 2), aggregated
    // straight into shared-shingle counts — no separate candidate stage
    sh.select(col(idCol).as("id_a"), col("sh"))
      .join(sh.select(col(idCol).as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .select(
        col("id_a"), col("id_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash over the document's distinct words. Bit i of a word is
    * the low bit of hex digit i+1 of md5(word); the signature bit is set
    * when the sum of (±1) votes is positive. Pure built-in expressions,
    * identical in the SQL oracle.
    */
  def simhash16(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = docs
      .select(col(idCol), explode(array_distinct(wordsArr(col(textCol)))).as("w"))
      .withColumn("h", md5(col("w")))
    val bitVotes = words
      .select(col(idCol), col("h"), explode(sequence(lit(0), lit(15))).as("i"))
      .withColumn(
        "vote",
        expr("CASE WHEN (instr('0123456789abcdef', substring(h, i + 1, 1)) - 1) % 2 = 1 " +
          "THEN 1 ELSE -1 END"))
      .groupBy(col(idCol), col("i"))
      .agg(sum(col("vote")).as("v"))
    bitVotes
      .groupBy(col(idCol))
      .agg(sum(when(col("v") > 0, expr("shiftleft(1L, i)")).otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, candidate-
    * generated by banding the 16 bits into 4-bit chunks (pigeonhole: any
    * pair within distance 3 agrees on at least one of 4 chunks — an
    * equality join, never a cross product).
    */
  def simhashPairs(sigs: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-band scheme guarantees recall only for distance <= 3")
    val banded = sigs.select(
      col(idCol), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("chunk", expr("(simhash >> (b * 4)) & 15"))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"), col("b"), col("chunk"))
    val bd = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"), col("b"), col("chunk"))
    a.join(bd, Seq("b", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
