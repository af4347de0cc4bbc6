package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query from [[SparkEntry.queries]] repeatedly
  * in a single JVM — `runMain graft.BenchOne <name> <sfDir> [reps]`.
  * Prints one line per rep so warmup vs steady-state and run-to-run
  * variance are visible (Bench measures each query once per round).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
