package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE-APPLY cost-curve measurement (round-15 verdict item 2): wall
  * time of the q360-shape corpus encode vs |merges|, for BOTH kernels —
  * the sequential replay ([[graft.functions.BpeEncode]],
  * O(|merges|·len) per first-seen word) and the rank-priority encoder
  * ([[graft.functions.BpeEncodeRanked]], O(len²) per first-seen word,
  * |merges|-independent).
  *
  * `runMain graft.tools.BpeCurve <sfDir> [learnMerges] [sizesCsv]`
  *
  * Measurement design:
  *   - merge tables are PREFIXES of one table learned to `learnMerges`
  *     via the batched q288 path (a prefix of a valid learned sequence
  *     is itself a valid learned table);
  *   - sizes past the corpus's learnable capacity extend the learned
  *     table with VALID digit-seeded doubling ladders (each ladder
  *     entry's symbols exist by construction) — replay pays its
  *     per-merge scan whether or not a merge fires, so filler measures
  *     exactly the 32k-vocabulary cost the class doc extrapolates;
  *   - each (size, kernel) cell is min-of-2 of a materialized
  *     `toRdd.count()` over the full q360 projection;
  *   - a final pair of cells encodes a HIGH-CARDINALITY derived word
  *     stream (md5-hex of orders keys — every word a memo MISS) at the
  *     largest size: the long-tail-vocabulary shape where the per-word
  *     first-encode cost, not the memo hit rate, dominates.
  *
  * Output: one JSON line per cell. Benchmark input derivation only —
  * never an oracle fixture.
  */
object BpeCurve {

  private def time2(body: => Unit): Double = {
    val t = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    t.min
  }

  /** Valid filler ladders: for seed (c1, c2) the LINEAR chain
    * (c1,c2)→s, (s,s)→ss, (ss,s)→sss … — every pair's symbols exist
    * when the pair is learned, and symbols grow 2 chars per rung (a
    * doubling chain would produce 2^depth-char plan literals).
    */
  private def ladders(n: Int): Seq[(String, String)] = {
    val seeds = for (a <- 'a' to 'z'; d <- '0' to '9') yield (a.toString, d.toString)
    val out = collection.mutable.Buffer.empty[(String, String)]
    val depth = n / seeds.size + 1
    val it = seeds.iterator
    while (out.size < n && it.hasNext) {
      val (a, d) = it.next()
      val s = a + d
      var sym = s
      out += ((a, d))
      var k = 0
      while (out.size < n && k < depth) {
        out += ((sym, s))
        sym = sym + s
        k += 1
      }
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val learnMerges = if (args.length > 1) args(1).toInt else 256
    val sizes = (if (args.length > 2) args(2) else "5,64,256,4096,32768")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.SessionDefaults.harness(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val learned = graft.queries.TextQueries
      .bpeRoundsBatched(spark, sfDir, learnMerges, maxBatch = 32)
      ._1.map(m => (m._2, m._3))
    val learnSec = (System.nanoTime() - t0) / 1e9
    println(f"""{"stage":"learn","merges":${learned.size},"sec":$learnSec%.1f,"sf":"$sfDir"}""")
    spark.catalog.clearCache()
    org.apache.spark.sql.graft.Bridge.freeAllPersistedRdds(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def corpusApply(merges: Seq[(String, String)], ranked: Boolean): Unit = {
      graft.queries.TextQueries.bpeApplyProjection(docs, merges, ranked)
        .queryExecution.toRdd.count()
      ()
    }
    // one warmup pass so both kernels' hot paths are C2-compiled
    corpusApply(learned.take(5), ranked = false)
    corpusApply(learned.take(5), ranked = true)

    for (n <- sizes) {
      val table =
        if (n <= learned.size) learned.take(n)
        else learned ++ ladders(n - learned.size)
      for (ranked <- Seq(false, true)) {
        val sec = time2(corpusApply(table, ranked))
        val kern = if (ranked) "ranked" else "replay"
        println(f"""{"stage":"corpus_apply","kernel":"$kern","merges":${table.size},"sec":$sec%.2f}""")
      }
    }

    // memo-miss stream: every word distinct (md5-hex of the orders key),
    // one word per row — the first-encode cost isolated from memo hits
    val largest = {
      val n = sizes.max
      if (n <= learned.size) learned.take(n) else learned ++ ladders(n - learned.size)
    }
    // ~20k rows regardless of SF: the memo-miss cell measures PER-WORD
    // first-encode cost (every word distinct), not scan throughput — a
    // full 1.5M-row stream at 32k replay merges would take hours and
    // tell the same story
    val hexN = spark.read.parquet(s"$sfDir/orders.parquet").count()
    val hexEvery = math.max(1L, hexN / 20000L)
    val hexDocs = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(pmod(col("o_orderkey"), lit(hexEvery)) === 0L)
      .select(col("o_orderkey").as("doc_id"),
        substring(md5(col("o_orderkey").cast("string")), 1, 16).as("text"))
    def hexApply(ranked: Boolean): Unit = {
      graft.queries.TextQueries.bpeApplyProjection(hexDocs, largest, ranked)
        .queryExecution.toRdd.count()
      ()
    }
    hexApply(ranked = true) // warmup the distinct-word path
    for (ranked <- Seq(false, true)) {
      val sec = time2(hexApply(ranked))
      val kern = if (ranked) "ranked" else "replay"
      println(f"""{"stage":"memo_miss_apply","kernel":"$kern","merges":${largest.size},"sec":$sec%.2f}""")
    }
    System.out.flush()
    spark.stop()
  }
}
