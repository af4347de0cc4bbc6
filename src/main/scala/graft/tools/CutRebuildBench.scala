package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for the q344 rebuild fix (round-13 verdict item 1):
  * times the native [[graft.functions.KeepTokens]] merge-walk against
  * the round-12 HOF formulation on the adversarial fixture the verdict
  * named — one document of `nTokens` tokens with `nTokens/2` cut
  * positions, i.e. the long/mostly-duplicated single-row straggler
  * shape. `runMain graft.tools.CutRebuildBench [nTokens] [reps]`
  * (defaults 50000, 3). Prints one JSON line with the min wall seconds
  * of each formulation; the HOF side is O(n·c) per row, the native side
  * O(n + c log c), so the ratio IS the defect being measured.
  */
object CutRebuildBench {

  // the shared reference formulation — see KeepTokens.hofRebuild
  private def hofRebuild(w: Column, cs: Column): Column =
    graft.functions.KeepTokens.hofRebuild(w, cs)

  def main(args: Array[String]): Unit = {
    val nTokens = if (args.length > 0) args(0).toInt else 50000
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.sources.SessionDefaults.harness(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val toks = (0 until nTokens).map(i => s"tok$i")
    val cuts = rnd.shuffle((1 to nTokens).toList).take(nTokens / 2)
    val df = Seq((1L, toks, cuts)).toDF("id", "w", "cs").persist()
    df.count()

    def time(col: Column): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val out = df.select(length(col).as("len")).collect()
        require(out.head.getInt(0) > 0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    val native = time(graft.functions.KeepTokens($"w", $"cs"))
    val hof = time(hofRebuild($"w", $"cs"))
    // scalastyle:off println
    println(f"""{"fixture":{"n_tokens":$nTokens,"n_cuts":${nTokens / 2}},""" +
      f""""native_sec":$native%.4f,"hof_sec":$hof%.4f,""" +
      f""""speedup":${hof / native}%.1f}""")
    // scalastyle:on println
    spark.stop()
  }
}
