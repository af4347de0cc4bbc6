package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction (reference `src/functions.cpp:104-127`):
  * word → sorted set of distinct doc IDs ("postings"), plus the derived
  * document frequency and first-letter bucket.
  *
  * Spark-first design notes (vs the reference's 26 fixed reducer buckets):
  *   - the aggregation is hash-partitioned on `word` across ALL shuffle
  *     partitions, not on the 26-way first-letter key — the reference's
  *     letter buckets are badly skewed (its own goldens: `s.txt` huge,
  *     `z.txt` 33 lines) and cap parallelism at 26. `letter` is carried
  *     only as a derived output/partition column, which preserves output
  *     semantics exactly while scaling to any partition count (SURVEY §4.3);
  *   - `collect_set` + `sort_array` reproduces `std::set<int>` union
  *     (ascending, unique) deterministically;
  *   - at 100 TB, per-word postings for stop-words grow unboundedly; the
  *     aggregation spills (Spark `ObjectHashAggregate` → sort-based
  *     fallback), and df-only consumers should use [[docFrequency]] which
  *     never materializes postings (partial-aggregatable `count(distinct)`).
  */
object InvertedIndex {

  /** `(doc_id, word)` distinct pairs → `(word, letter, postings, df)`.
    * Postings are ascending distinct doc IDs; `letter` = first letter.
    */
  def build(docWords: DataFrame): DataFrame =
    docWords
      .groupBy("word")
      .agg(sort_array(collect_set(col("doc_id"))).as("postings"))
      .withColumn("df", size(col("postings")).cast("long"))
      .withColumn("letter", substring(col("word"), 1, 1))

  /** Same result from the RAW token stream, one shuffle instead of two:
    * `collect_set` is itself distinct, so a separate `dropDuplicates`
    * exchange ahead of the word aggregation is redundant — the map-side
    * partial `collect_set` performs the per-doc dedup the reference does
    * in its `partial_map` (`src/functions.cpp:75-87`), and only set
    * partials cross the wire. Preferred at scale.
    */
  def buildFromTokens(tokens: DataFrame): DataFrame =
    build(tokens) // identical plan need: groupBy(word) + collect_set dedups

  /** df-only variant: `(word, df)` without materializing postings —
    * the scalable path when only document frequency is needed.
    */
  def docFrequency(docWords: DataFrame): DataFrame =
    docWords.groupBy("word")
      .agg(count(col("doc_id")).as("df")) // pairs are already distinct
      .withColumn("letter", substring(col("word"), 1, 1))

  /** Render the reference's row format `word:[id1 id2 … idn]`
    * (`src/functions.cpp:150-161`).
    */
  def formatted(index: DataFrame): DataFrame =
    index.withColumn(
      "row",
      concat(col("word"), lit(":["), array_join(col("postings"), " "), lit("]")))
}
