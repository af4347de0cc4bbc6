package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query from [[SparkEntry.queries]] repeatedly
  * in a single JVM — `runMain graft.BenchOne <name> <sfDir> [reps]` —
  * or sweep EVERY registered query once with `<name> = ALL` (the
  * 10x-scale smoke pass: catches queries that are correct at oracle
  * scale but pathological one scale up). `<name>` may also be a
  * comma-separated list: each named query runs `reps` times and a
  * per-query `min=` summary line prints at the end (the steady-state
  * numbers SCALE.md commits). Prints one line per run so warmup vs
  * steady-state and run-to-run variance are visible.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = graft.sources.SessionDefaults.harness(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // dev knob for partition-count experiments; the canonical sweep
      // (Bench) stays pinned at 32
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failures = 0
    val mins = collection.mutable.LinkedHashMap.empty[String, Double]
    def time(q: String, label: String): Unit = {
      val t0 = System.nanoTime()
      try {
        // toRdd.count(): full-plan materialization, never the
        // count-collapsed plan (see Bench.scala — pruned row-preserving
        // shapes would otherwise "benchmark" as bare scans)
        val n = SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        mins(q) = math.min(mins.getOrElse(q, Double.MaxValue), sec)
        println(f"[benchone] $q $label: $sec%.3f s ($n rows)")
      } catch {
        // NonFatal only: an OOM or similar must abort the sweep — timings
        // from a corrupted JVM would be meaningless
        case scala.util.control.NonFatal(e) =>
          failures += 1
          println(s"[benchone] $q $label: FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
        org.apache.spark.sql.graft.Bridge.freeAllPersistedRdds(spark)
      }
    }
    if (name == "ALL")
      SparkEntry.queries.keys.toSeq.sorted.foreach(q => time(q, "sweep"))
    else {
      val names = name.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      names.foreach(q =>
        require(SparkEntry.queries.contains(q), s"unknown query: $q"))
      names.foreach(q => (1 to reps).foreach(i => time(q, s"rep $i")))
      names.foreach(q =>
        mins.get(q).foreach(m => println(f"[benchone] $q min=$m%.3f s")))
    }
    spark.stop()
    if (failures > 0) {
      System.err.println(s"[benchone] $failures quer${if (failures == 1) "y" else "ies"} FAILED")
      sys.exit(1)
    }
  }
}
