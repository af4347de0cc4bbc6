package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared near-duplicate candidate/pair builders over the `documents`
  * table — the dedup-family analog of [[Edges]] for the graph family:
  * ONE definition of each expensive build, consumed by every query that
  * needs it (q31/q37/q38/q114/q127/q220/q227/q230/q231/q256/q272/
  * q205 via q178-style composition), so the 0.05 threshold, the
  * 3-gram shingle width, the 8-hash/r=2 LSH shape and the persist
  * placement can never drift between consumers.
  *
  * Persist/cache lifecycle stays with the query runner (clearCache +
  * freeAllPersistedRdds per query); within one query plan Spark's
  * CacheManager already dedups identical persisted subplans, so two
  * consumers of [[shingleTable]] inside one query share one cached
  * build.
  */
object NearDup {

  /** The corpus-wide near-dup similarity threshold and shingle width —
    * THE constants every consumer shares.
    */
  val Threshold = 0.05
  val ShingleN = 3
  val NumHashes = 8

  private def docs(spark: SparkSession, dir: String): DataFrame =
    // the shingle generator above this scan is the near-dup family's
    // dominant narrow stage; see ScanSpread
    graft.sources.ScanSpread.spread(
      spark.read.parquet(s"$dir/documents.parquet"))

  /** Distinct (doc_id, sh) long-format shingle table, materialized
    * through ONE doc-keyed exchange — the input both candidate
    * generators and the exact verifier read. The r16 persist here was
    * read by up to four leaf stages (signature agg, size agg, both
    * verify join sides) that raced the cold cache at action start,
    * each re-running the whole shingle generator (the raced-lazy-cache
    * pathology); ending the build in an exchange makes the generator
    * run once as the shuffle's map side, every consumer reads the
    * reused shuffle, and the doc-keyed aggregations (minhash
    * signatures, set sizes) arrive co-partitioned.
    */
  def shingleTable(spark: SparkSession, dir: String): DataFrame =
    Dedup.shinglePairs(docs(spark, dir), "text", "doc_id", ShingleN)
      .repartition(col("doc_id"))

  /** EXACT shared-shingle Jaccard pairs at [[Threshold]] with their
    * scores — the all-pairs ground truth (shared-shingle equi-join,
    * cross-product-free). Schema: (id_a, id_b, jaccard).
    */
  def exactPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(docs(spark, dir), "text", "doc_id", Threshold, ShingleN)

  /** [[exactPairs]] projected to the bare edge list — what the
    * clustering/survivorship consumers (q37/q38/q114/q256) join on.
    */
  def exactPairIds(spark: SparkSession, dir: String): DataFrame =
    exactPairs(spark, dir).select(col("id_a"), col("id_b"))

  /** MinHash([[NumHashes]]) + banded-LSH (r=2) candidates verified with
    * exact Jaccard — the production-scale approximate path (q31 and its
    * auditors). Schema: (id_a, id_b, jaccard). Both the shingle table
    * and the candidate set are persisted: the verify join reads the
    * shingles on both sides, and broadcast planning of downstream joins
    * would otherwise re-run the LSH pipeline per reference.
    */
  def lshVerifiedPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleTable(spark, dir)
    val cand = Dedup.minhashLshCandidates(sh, "doc_id", NumHashes).persist()
    Dedup.jaccardVerify(cand, sh, "doc_id")
  }
}
