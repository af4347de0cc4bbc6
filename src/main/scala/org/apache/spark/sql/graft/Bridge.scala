package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column <-> Expression bridge. Spark 4 made these conversions
  * `private[sql]`; extensions conventionally expose them from a package
  * under `org.apache.spark.sql`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the storage blocks behind a `localCheckpoint`ed Dataset.
    * Checkpoint blocks are RDD-level caches OUTSIDE the CacheManager, so
    * `spark.catalog.clearCache()` never releases them; iterative
    * algorithms that checkpoint per round must drop superseded rounds
    * explicitly or dead label tables accumulate for the session's life.
    */
  def freeLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.logical.collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(blocking = false))
}
