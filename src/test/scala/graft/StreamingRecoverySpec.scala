package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint/state recovery: a watermarked aggregation over a file
  * source must resume from its checkpoint after the query is stopped and
  * restarted, folding pre- and post-restart data into the same state —
  * the property that makes the streaming operators production-usable.
  */
class StreamingRecoverySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("file-source aggregation recovers across query restarts") {
    val base = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$base/in"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(srcDir))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("n", LongType)))

    def write(name: String, rows: Seq[(Long, Long)]): Unit =
      Files.writeString(
        Paths.get(srcDir, name),
        rows.map { case (u, n) => s"""{"user_id":$u,"n":$n}""" }.mkString("\n"))

    def start() = spark.readStream.schema(schema).json(srcDir)
      .groupBy("user_id").agg(sum("n").as("total"))
      .writeStream.format("memory").queryName("recov")
      .outputMode("complete").option("checkpointLocation", ckpt).start()

    write("b1.json", Seq((1L, 10L), (2L, 5L)))
    val q1 = start()
    q1.processAllAvailable()
    assert(spark.table("recov").as[(Long, Long)].collect().toMap ==
      Map(1L -> 10L, 2L -> 5L))
    q1.stop()

    write("b2.json", Seq((1L, 7L), (3L, 1L)))
    val q2 = start() // same checkpoint: must fold b1 state with b2
    q2.processAllAvailable()
    try {
      assert(spark.table("recov").as[(Long, Long)].collect().toMap ==
        Map(1L -> 17L, 2L -> 5L, 3L -> 1L))
    } finally q2.stop()
  }
}
