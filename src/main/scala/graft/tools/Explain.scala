package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of one registered
  * query (`runMain graft.tools.Explain <name> [sfDir]`) — the plan-audit
  * loop the build process runs after each operator lands.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
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
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
