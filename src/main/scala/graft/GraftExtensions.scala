package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.AsciiCleanLower

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions so SQL users get them too.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Programmatic use on an existing session: [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ascii_clean_lower"),
      new ExpressionInfo(classOf[AsciiCleanLower].getName, "ascii_clean_lower"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AsciiCleanLower(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.SimplifyAsciiCleanLower)
  }
}

object GraftFunctions {
  /** Register the engine's SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ascii_clean_lower",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AsciiCleanLower(exprs.head),
      "built-in")
}
