package graft.operators

/** Bounded wait for an `Observation` metric (ADVICE r16): observed
  * metrics are delivered asynchronously by a QueryExecutionListener
  * after the action that materialized the plan, and `Observation.get`
  * blocks indefinitely — if any Spark path ever materialized an eager
  * localCheckpoint without routing through `withAction` (or the action
  * partially failed after the checkpoint), a driver loop polling `get`
  * would hang instead of erroring. This helper awaits the observation's
  * future with a deadline and degrades to the caller's exact fallback
  * probe, so a metrics-delivery regression costs one extra (cheap,
  * reads the already-materialized blocks) job instead of a hang.
  */
private[graft] object Observed {
  def long(obs: org.apache.spark.sql.Observation, name: String,
           timeoutMs: Long = 30000L)(fallback: => Long): Long =
    try {
      val row = scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(timeoutMs, "ms"))
      row.getAs[Long](name)
    } catch {
      case _: java.util.concurrent.TimeoutException => fallback
    }
}
