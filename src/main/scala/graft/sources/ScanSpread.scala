package graft.sources

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan spreading — the guide-§2.5 "input skew" remedy
  * (one huge unsplittable input ⇒ repartition immediately after the
  * read) applied to the corpus readers that feed per-row-HEAVY
  * pipelines (tokenize/md5/shingle/encode/vector scoring).
  *
  * Why it exists: parquet is splittable only at row-group boundaries,
  * and a single-row-group file scans as ONE task no matter the cluster
  * — every downstream narrow stage (the expensive per-document work)
  * then runs serially until the first exchange. The fixture tables are
  * exactly that shape (one row group each), and any real corpus can
  * contain such files (a compacted shard, a gzip text source).
  *
  * Scale-adaptive, not a local[32] constant: the round-robin exchange
  * is added ONLY when the planned scan parallelism is below the
  * session's `defaultParallelism` (cores locally, executor slots on a
  * cluster). A 100 TB scan plans thousands of splits, so this is a
  * no-op there; at any scale the condition reads "the scan cannot
  * feed the cluster" and the fix is the standard one. Determinism:
  * `repartition(n)` is round-robin with sort-before-repartition (the
  * Spark default), so row placement is deterministic, and every
  * downstream operator in this engine is partition-invariant by the
  * repo's standing determinism contract (DeterminismSpec grids).
  */
object ScanSpread {

  /** `df` repartitioned to `defaultParallelism` when its planned scan
    * parallelism is below it; `df` unchanged otherwise.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // planned (not executed) partition count of the scan — cheap: this
    // compiles the one-node read plan, it runs nothing
    val planned = df.queryExecution.toRdd.getNumPartitions
    if (planned < target) df.repartition(target) else df
  }
}
