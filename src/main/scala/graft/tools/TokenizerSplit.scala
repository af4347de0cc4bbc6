package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Learn/apply SPLIT timing for the two tokenizer families (round-16
  * verdict item 4): the committed q360/q368/q378 rows time learn +
  * apply together and the learn loop dominates, so the apply kernels'
  * own scaling is invisible in them. This tool prices the stages
  * separately on one corpus:
  *
  *   - `bpe_learn5` — the q360/q368 5-round sequential learner
  *     (driver-bounded; one pair-count aggregation per round);
  *   - `bpe_apply_replay` / `bpe_apply_ranked` — the full q360-shape
  *     corpus encode under the PRE-learned merge table, min-of-2 of a
  *     materialized `toRdd.count()` (the BenchOne discipline);
  *   - `unigram_learn` — q377's seed + 2 hard-EM rounds;
  *   - `unigram_apply` — q378's Viterbi corpus encode under the
  *     pre-learned piece table, min-of-2.
  *
  * `runMain graft.tools.TokenizerSplit <sfDir>`. Benchmark readout
  * only — never an oracle fixture; the kernels and tables are the
  * exact private[graft] helpers the gated queries run.
  */
object TokenizerSplit {

  private def time1(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def time2(body: => Unit): Double =
    (1 to 2).map(_ => time1(body)).min

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.sources.SessionDefaults.harness(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    def release(): Unit = {
      spark.catalog.clearCache()
      org.apache.spark.sql.graft.Bridge.freeAllPersistedRdds(spark)
    }
    def run(df: DataFrame): Unit = { df.queryExecution.toRdd.count(); () }
    def emit(stage: String, sec: Double): Unit =
      println(f"""{"stage":"$stage","sec":$sec%.3f,"sf":"$sfDir"}""")

    var merges: Seq[(String, String)] = Nil
    emit("bpe_learn5", time1 {
      merges = graft.queries.TextQueries.bpeRounds(spark, sfDir, 5)
        ._1.map(m => (m._2, m._3))
      release()
    })
    emit("bpe_apply_replay", time2 {
      run(graft.queries.TextQueries.bpeApplyProjection(d, merges))
      release()
    })
    emit("bpe_apply_ranked", time2 {
      run(graft.queries.TextQueries.bpeApplyProjection(d, merges, ranked = true))
      release()
    })

    var lpTable: Seq[(String, Long)] = Nil
    emit("unigram_learn", time1 {
      lpTable = graft.queries.TextQueries.unigramVocab(spark, sfDir)
        .map { case (p, _, l) => (p, l) }
      release()
    })
    emit("unigram_apply", time2 {
      run(graft.queries.TextQueries.unigramApplyProjection(d, lpTable))
      release()
    })
    spark.stop()
  }
}
