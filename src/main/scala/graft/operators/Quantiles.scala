package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rank-based quantile assignment without the single-partition sort
  * that `ntile(k).over(Window.orderBy(...))` plans.
  *
  * SQL `ntile` is a pure function of a row's RANK in the total order
  * (first `n mod k` buckets get `⌈n/k⌉` rows, the rest `⌊n/k⌋`), so an
  * exact distributed global rank reproduces it bit-for-bit:
  *
  *   1. `repartitionByRange` on the sort expressions — each partition
  *      holds a contiguous key range, at full parallelism;
  *   2. per-partition `row_number` (window PARTITIONED by the range
  *      partition id — a parallel window, never SinglePartition);
  *   3. per-partition row counts (one tiny aggregate, ≤ #partitions
  *      rows) collected and turned into broadcast rank offsets;
  *   4. `rank = offset(pid) + local row_number`, bucket from the closed
  *      form via exact integer `DIV`.
  *
  * The count collect is bounded by the shuffle-partition count (the same
  * contract as the k-seed collects in Similarity) — no corpus row ever
  * reaches the driver. Rank arithmetic assumes `n < 2^63` and is exact
  * integer throughout. The ranged table is persisted so the offset pass
  * and the rank pass see the SAME partitioning (exchange reuse across
  * separate jobs is not guaranteed); the query runner owns the cache
  * lifecycle.
  *
  * Requires the sort to be a TOTAL order (unique keys — callers append a
  * tiebreak id column), which is also what makes `ntile` deterministic
  * in the oracle.
  */
object Quantiles {

  /** Adds column `out` = exact SQL `ntile(k)` over `order` (must be a
    * total order). Plan shape: one range exchange + one pid-partitioned
    * window — no single-partition stage touches the input grain.
    */
  def ntileExact(df: DataFrame, k: Int, order: Seq[Column], out: String): DataFrame = {
    require(k > 0, "ntileExact needs k > 0")
    val pid = "_nt_pid"
    val rn = "_nt_rn"
    val rk = "_nt_rank"
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    // bounded: one row per range partition
    val cnts = ranged.groupBy(col(pid)).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = cnts.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      cnts.map { case (p, c) => val o = (p, acc); acc += c; o }.toMap
    }
    val sz = n / k
    val rem = n % k
    val bucket =
      if (sz == 0L) s"CAST($rk AS INT)"
      else s"CAST(CASE WHEN $rk <= ${(sz + 1) * rem} " +
        s"THEN ($rk - 1) DIV ${sz + 1} + 1 " +
        s"ELSE $rem + (($rk - 1) - ${(sz + 1) * rem}) DIV $sz + 1 END AS INT)"
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
    ranged
      .withColumn(rn, row_number().over(w))
      .withColumn(rk, coalesce(element_at(typedlit(offsets), col(pid)), lit(0L)) + col(rn))
      .withColumn(out, expr(bucket))
      .drop(pid, rn, rk)
  }
}
