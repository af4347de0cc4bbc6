package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset, SparkSession}
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

  /** Drain the SparkListener event bus (delivery is asynchronous) so a
    * listener-aggregating tool reads a complete view — dev tooling
    * support (ProfileOne's stage table); `listenerBus` is
    * `private[spark]`, hence exposed from this bridge package.
    */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Free the storage blocks behind a `localCheckpoint`ed Dataset.
    * Checkpoint blocks are RDD-level caches OUTSIDE the CacheManager, so
    * `spark.catalog.clearCache()` never releases them; iterative
    * algorithms that checkpoint per round must drop superseded rounds
    * explicitly or dead label tables accumulate for the session's life.
    *
    * CONTRACT: the argument must be the checkpointed Dataset ITSELF (its
    * plan root a single `LogicalRDD`) and the caller its sole owner —
    * checkpoint blocks cannot be recomputed, so unpersisting a
    * checkpointed table that a derived plan merely references would
    * irrecoverably destroy a shared input. Enforced: any other plan
    * shape throws instead of guessing.
    */
  def freeLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case other => throw new IllegalArgumentException(
        "freeLocalCheckpoint requires the checkpointed Dataset itself " +
          s"(plan root LogicalRDD), got ${other.nodeName} — freeing " +
          "LogicalRDDs reachable from a derived plan could destroy " +
          "unrecomputable inputs shared with other plans")
    }

  /** Free EVERY persisted RDD in the session — `persist()`ed plans and
    * `localCheckpoint` blocks alike (the latter live outside the
    * CacheManager, so `clearCache()` alone leaks them). For runners
    * (Verify/Bench/BenchOne) that own the cache lifecycle: call AFTER a
    * query's results are fully materialized, never mid-plan — local-
    * checkpoint blocks cannot be recomputed once dropped.
    *
    * SCOPE: this unpersists every persisted RDD in the SparkContext,
    * including ones persisted by code outside the caller's ownership. It
    * must only run on sessions whose caches are WHOLLY runner-owned (the
    * dedicated Verify/Bench JVMs); never call it on a shared session
    * (notebook, concurrently-running suite) — it is runner-infrastructure,
    * not a library API.
    */
  def freeAllPersistedRdds(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

  /** Storage location of a catalog table. `private[sql]` session state
    * is the only road to an EXTERNAL table's path (the catalog API
    * exposes none), and graft's materialized graph tables are external —
    * DROP TABLE alone would strand their files in the warehouse, which
    * is exactly what the superseded-table GC needs to clean up.
    */
  def tableLocation(spark: SparkSession, table: String): java.net.URI =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
}
