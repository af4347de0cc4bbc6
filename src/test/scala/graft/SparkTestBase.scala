package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
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
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.spark
  def sfDir: String = "/root/testdata/sf0.001"
}
