package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key (the standard time-series
  * "last known value" join; absent from the reference — extended surface,
  * SURVEY §2.2 joins).
  *
  * Spark-first design: Spark has no native as-of join, and the naive
  * `left.join(right, key && rt <= lt)` + groupBy-max explodes to
  * |left|×|right| per key before pruning. Instead we use the union-window
  * formulation, which is a single shuffle on `key` and never materializes
  * the cross product:
  *
  *   1. tag left (side=1) and right (side=0) rows, union on a common schema;
  *   2. one window `partitionBy(key).orderBy(time, side)` with
  *      `last(rightPayload, ignoreNulls)` over `rowsBetween(unbounded, 0)`
  *      carries the latest right payload forward onto every row;
  *   3. keep only left rows.
  *
  * Ordering `(time, side)` with right=0 < left=1 gives `<=` semantics
  * (a right row at exactly leftTime is visible). Cost: one hash exchange on
  * `key` + an in-partition sort — the same shape as a sort-merge join, so it
  * scales to 100 TB with skew handled by AQE. Right rows should be unique
  * per (key, time); callers dedupe with a deterministic tie-break first.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (quote/state) side
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right columns to carry onto matching left rows
    *                   (emitted with an `asof_` prefix; null when no right
    *                   row precedes the left row)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "__asof_t"
    val side = "__asof_side"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .select(
        Seq(col(key), col(t), col(side)) ++
          leftCols.filterNot(_ == key).map(col) ++
          rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)

    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(0))
      .select(
        Seq(col(key), col(t), col(side)) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightCols.map(c => col(c).as(s"asof_$c")): _*)

    val w = Window
      .partitionBy(key)
      .orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col(side) === 1)
      .drop(t, side)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key (next-event lookup — the
    * time-reversed twin of [[apply]]). Same union-window plan, scanned in
    * DESCENDING time so `last(..., ignoreNulls)` carries the nearest
    * FUTURE right payload backward; ordering `(t DESC, side)` with
    * right=0 < left=1 keeps a right row at exactly leftTime visible
    * (`>=` semantics). One hash exchange on `key`, no cross product.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "__asof_t"
    val side = "__asof_side"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .select(
        Seq(col(key), col(t), col(side)) ++
          leftCols.filterNot(_ == key).map(col) ++
          rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")): _*)

    val r = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(0))
      .select(
        Seq(col(key), col(t), col(side)) ++
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightCols.map(c => col(c).as(s"asof_$c")): _*)

    val w = Window
      .partitionBy(key)
      .orderBy(col(t).desc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col(side) === 1)
      .drop(t, side)
  }
}
