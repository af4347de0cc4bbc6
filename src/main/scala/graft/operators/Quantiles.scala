package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rank / ntile / prefix-sum over a TOTAL order without the
  * single-partition sort that `Window.orderBy(...)` (no partition key)
  * plans.
  *
  * Shared machinery: `repartitionByRange` on the sort expressions (each
  * partition holds a contiguous key range, full parallelism), a bounded
  * per-partition aggregate (≤ #shuffle-partitions rows) collected into
  * broadcast OFFSETS, and a partition-id-partitioned window that adds
  * the local contribution — `global = offset(pid) + local`. The collect
  * is bounded by the shuffle-partition count (the same contract as the
  * k-seed collects in Similarity); no input row ever reaches the
  * driver. The ranged table is persisted so the offset pass and the
  * window pass see the SAME partitioning (exchange reuse across
  * separate jobs is not guaranteed); the query runner owns the cache
  * lifecycle.
  *
  * All callers must supply a total order (append a tiebreak id column)
  * — which is also what makes the oracle-side window formulations
  * deterministic.
  */
object Quantiles {

  /** Range-partitioned input + per-partition offsets of `perPart`
    * (a bounded aggregate evaluated per range partition, accumulated in
    * ascending partition order), + the grand total.
    */
  private def rangedWithOffsets(
      df: DataFrame, order: Seq[Column], pid: String,
      perPart: Column): (DataFrame, Map[Int, Long], Long) = {
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    val cnts = ranged.groupBy(col(pid)).agg(perPart.as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = cnts.map { case (p, c) => val o = (p, acc); acc += c; o }.toMap
    (ranged, offsets, acc)
  }

  private def offsetCol(offsets: Map[Int, Long], pid: String): Column =
    coalesce(element_at(typedlit(offsets), col(pid)), lit(0L))

  /** Adds column `out` = exact 1-based global rank (`row_number()` over
    * a global ORDER BY, but planned as one range exchange + one
    * pid-partitioned window — no single-partition stage).
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val pid = "_gr_pid"
    val rn = "_gr_rn"
    val (ranged, offsets, _) = rangedWithOffsets(df, order, pid, count(lit(1)))
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
    ranged
      .withColumn(rn, row_number().over(w))
      .withColumn(out, offsetCol(offsets, pid) + col(rn))
      .drop(pid, rn)
  }

  /** Adds column `out` = exact SQL `ntile(k)` over `order` (must be a
    * total order): the bucket is the closed form of the global rank
    * (first `n mod k` buckets take `⌈n/k⌉` rows) via exact integer
    * `DIV` — bit-equal to `ntile(k).over(Window.orderBy(...))`, without
    * its single-partition sort.
    */
  def ntileExact(df: DataFrame, k: Int, order: Seq[Column], out: String): DataFrame = {
    require(k > 0, "ntileExact needs k > 0")
    val pid = "_nt_pid"
    val rn = "_nt_rn"
    val rk = "_nt_rank"
    val (ranged, offsets, n) = rangedWithOffsets(df, order, pid, count(lit(1)))
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
      .withColumn(rk, offsetCol(offsets, pid) + col(rn))
      .withColumn(out, expr(bucket))
      .drop(pid, rn, rk)
  }

  /** Adds, for each `(valueCol, outCol)` pair, the exact inclusive
    * running total of `valueCol` over `order` — the distributed prefix
    * sum: per-partition window sums plus broadcast per-partition value
    * offsets. Equivalent to `sum(v).over(Window.orderBy(...))` with no
    * single-partition stage; all value columns share ONE range exchange
    * and ONE pid window. Values must be integral (LongType) so the
    * offset accumulation is exact.
    */
  def prefixSums(
      df: DataFrame, order: Seq[Column],
      sums: Seq[(String, String)]): DataFrame = {
    require(sums.nonEmpty, "prefixSums needs at least one value column")
    val pid = "_ps_pid"
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    val aggs = sums.map { case (v, _) => sum(col(v)).as(s"_ps_$v") }
    val rows = ranged.groupBy(col(pid)).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    val offsetMaps: Seq[Map[Int, Long]] = sums.indices.map { i =>
      var acc = 0L
      rows.map { r =>
        val o = (r.getInt(0), acc)
        if (!r.isNullAt(i + 1)) acc += r.getLong(i + 1)
        o
      }.toMap
    }
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.zip(offsetMaps).foldLeft(ranged) { case (d, ((v, out), m)) =>
      d.withColumn(out, offsetCol(m, pid) + sum(col(v)).over(w))
    }.drop(pid)
  }

  /** [[prefixSums]] for DECIMAL value columns: per-partition offsets
    * accumulate as exact BigDecimal on the driver (bounded by the
    * shuffle-partition count, same contract) and re-enter the plan as
    * decimal literals through a pid when-chain — so the running total
    * is exact at ANY corpus size, where a scaled-long encoding
    * overflows 2⁶³ (for rev·10⁴, around SF ~4000). Each value column
    * must be DecimalType; its running total is carried at
    * decimal(38, s) with s = the INPUT column's scale (derived, not
    * hardcoded — a wider-scale input is never silently rounded).
    */
  def prefixSumsDecimal(
      df: DataFrame, order: Seq[Column],
      sums: Seq[(String, String)]): DataFrame = {
    require(sums.nonEmpty, "prefixSumsDecimal needs at least one value column")
    import org.apache.spark.sql.types.DecimalType
    val wide: Map[String, String] = sums.map { case (v, _) =>
      df.schema(v).dataType match {
        case d: DecimalType => v -> s"decimal(38,${d.scale})"
        case other => throw new IllegalArgumentException(
          s"prefixSumsDecimal needs DECIMAL value columns; '$v' is $other " +
            "(use prefixSums for integral values)")
      }
    }.toMap
    val pid = "_pd_pid"
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    val aggs = sums.map { case (v, _) =>
      sum(col(v).cast(wide(v))).as(s"_pd_$v") }
    val rows = ranged.groupBy(col(pid)).agg(aggs.head, aggs.tail: _*)
      .collect().sortBy(_.getInt(0))
    val offsetMaps: Seq[Map[Int, java.math.BigDecimal]] = sums.indices.map { i =>
      var acc = java.math.BigDecimal.ZERO
      rows.map { r =>
        val o = (r.getInt(0), acc)
        if (!r.isNullAt(i + 1)) acc = acc.add(r.getDecimal(i + 1))
        o
      }.toMap
    }
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.zip(offsetMaps).foldLeft(ranged) { case (d, ((v, out), m)) =>
      val t = wide(v)
      val offset = m.toSeq.sortBy(_._1).foldLeft(lit(java.math.BigDecimal.ZERO)
          .cast(t)) { case (c, (p, bd)) =>
        when(col(pid) === p, lit(bd).cast(t)).otherwise(c)
      }
      d.withColumn(out,
        (offset + sum(col(v).cast(t)).over(w)).cast(t))
    }.drop(pid)
  }

  /** Adds column `out` = array of the next `w` rows (as structs of ALL
    * input columns, nearest first, rows past the end of the data
    * omitted) in the TOTAL `order` — `lead(struct(*), j)` over a global
    * ORDER BY for j = 1..w, planned without the single-partition sort:
    * the sorted-neighborhood primitive (record linkage, adjacent-diff,
    * run detection).
    *
    * Plan: range exchange + pid-partitioned leads cover every row whose
    * whole neighborhood lies inside its own partition; the ≤ w last
    * rows of each partition miss some leads, and — because global
    * positions advance at most w past a boundary — every missing
    * neighbor is one of the FIRST w rows of ITS OWN partition. Both
    * patch sides are therefore ≤ w rows per partition; the patch is a
    * broadcast equi-join on the exact global position (the
    * withGlobalRank machinery), never a second corpus exchange.
    */
  def withNextRows(df: DataFrame, order: Seq[Column], w: Int, out: String): DataFrame = {
    require(w > 0, "withNextRows needs w > 0")
    val pid = "_nx_pid"
    val rn = "_nx_rn"
    val g = "_nx_g"
    val rowS = struct(df.columns.map(col).toIndexedSeq: _*)
    val (ranged, offsets, total) = rangedWithOffsets(df, order, pid, count(lit(1)))
    // per-partition sizes from consecutive offsets — bounded by the
    // shuffle-partition count, same contract as the offsets themselves
    val inOrder = offsets.toSeq.sortBy(_._1)
    val sizes: Map[Int, Long] = inOrder.zip(inOrder.drop(1).map(_._2) :+ total)
      .map { case ((p, o), nxt) => (p, nxt - o) }.toMap
    val wv = Window.partitionBy(col(pid)).orderBy(order: _*)
    val base = (1 to w).foldLeft(
      ranged
        .withColumn(rn, row_number().over(wv))
        .withColumn(g, offsetCol(offsets, pid) + col(rn))) { (d, j) =>
      d.withColumn(s"_nx_l$j", lead(rowS, j).over(wv))
    }
    val cnt = coalesce(element_at(typedlit(sizes), col(pid)), lit(0L))
    val interior = base.filter(col(rn) + w <= cnt)
    val edge = base.filter(col(rn) + w > cnt)
    val heads = base.filter(col(rn) <= w)
      .select(col(g).as("_nx_bg"), rowS.as("_nx_bs"))
    // lead j is missing exactly when rn + j > cnt → j ∈ [cnt−rn+1, w]
    // (clamped to ≥ 1); neighbors past the end of the data simply find
    // no head row and fall out of the join
    val missing = edge
      .select(col(g), explode(sequence(
        greatest(lit(1L), cnt - col(rn) + 1).cast("int"), lit(w))).as("_nx_j"))
      .join(broadcast(heads), col("_nx_bg") === col(g) + col("_nx_j"))
    val fillAggs = (1 to w).map(j =>
      max(when(col("_nx_j") === j, col("_nx_bs"))).as(s"_nx_f$j"))
    val fills = missing.groupBy(col(g)).agg(fillAggs.head, fillAggs.tail: _*)
    val patched = (1 to w).foldLeft(
      edge.join(broadcast(fills), Seq(g), "left")) { (d, j) =>
      d.withColumn(s"_nx_l$j", coalesce(col(s"_nx_l$j"), col(s"_nx_f$j")))
    }.drop((1 to w).map(j => s"_nx_f$j"): _*)
    interior.unionByName(patched)
      .withColumn(out,
        filter(array((1 to w).map(j => col(s"_nx_l$j")): _*), _.isNotNull))
      .drop((1 to w).map(j => s"_nx_l$j") ++ Seq(pid, rn, g): _*)
  }
}
