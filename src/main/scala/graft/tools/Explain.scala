package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one registered
  * query (`runMain graft.tools.Explain <name> [sfDir] [--count]`) — the
  * plan-audit loop the build process runs after each operator lands.
  * `--count` explains `df.groupBy().count()` instead: the plan the
  * bench harness actually executes, where column pruning (and, for
  * row-preserving joins, join elimination) can legally drop work the
  * full plan carries — the audit that keeps headline numbers honest.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val countMode = args.contains("--count")
    val sfDir = args.drop(1).filterNot(_ == "--count").headOption
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // checkpoint file checksums OFF for the proof harness: Spark 4.1's
      // ChecksumCheckpointFileManager routes every checkpoint rename through
      // Hadoop ChecksumFs, which shells out (fork+exec) per rename — a fork
      // that can wedge a many-threaded local JVM (observed: a stuck
      // jspawnhelper deadlocked a streaming gate's changelog commit). The
      // checksums protect durable production checkpoints; these JVMs run
      // MemoryStream gates on tmpfs-scratch checkpoints.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    (if (countMode) df.groupBy().count() else df).explain("formatted")
    spark.stop()
  }
}
