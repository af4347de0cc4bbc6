package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one registered
  * query (`runMain graft.tools.Explain <name> [sfDir] [--count]`) — the
  * plan-audit loop the build process runs after each operator lands.
  * `--count` explains `df.groupBy().count()` instead — the plan
  * `Dataset.count()` WOULD run, where column pruning (and, for
  * row-preserving joins, join elimination) legally drops work the full
  * plan carries. The bench harness deliberately does NOT execute this
  * plan (it times `queryExecution.toRdd.count()`, the full
  * materialization — see Bench.scala); the flag exists as the
  * before/after audit that exposed the collapse in the first place.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val countMode = args.contains("--count")
    val sfDir = args.drop(1).filterNot(_ == "--count").headOption
      .getOrElse("/root/testdata/sf0.01")
    val spark = graft.sources.SessionDefaults.harness(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    (if (countMode) df.groupBy().count() else df).explain("formatted")
    spark.stop()
  }
}
