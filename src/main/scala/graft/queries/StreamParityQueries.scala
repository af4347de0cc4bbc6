package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming operators run against the REAL corpus and checked by the
  * driver's DuckDB oracle — extending the hard correctness gate from
  * the index parity pair (q75/q76) to the ingest-hygiene surface.
  * MemoryStream + the chunked driver feed are the test-harness SOURCE
  * only (production reads Kafka/files via readStream); the operator
  * under test is the unbounded plan itself.
  */
object StreamParityQueries {

  /** Feed `(doc_id, text)` rows through a MemoryStream in doc_id-sorted
    * chunks of at most `maxChunk` docs, each chunk its own micro-batch
    * (q75's bounded-driver-memory harness, shared).
    */
  private def runChunked(
      spark: SparkSession, dir: String, sink: String,
      plan: DataFrame => DataFrame, numBatches: Int = 4,
      maxChunk: Int = 1024): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    spark.catalog.dropTempView(sink) // re-runnable within one session
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .sort("doc_id")
    val n = docs.count()
    val chunk = math.min(math.max(1L, (n + numBatches - 1) / numBatches),
      maxChunk.toLong).toInt
    val ms = MemoryStream[(Long, String)](spark)
    val q = plan(ms.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      docs.toLocalIterator().asScala.grouped(chunk).foreach { batch =>
        ms.addData(batch.toIndexedSeq)
        q.processAllAvailable() // barrier => each group is its own micro-batch
      }
    } finally q.stop()
    spark.table(sink)
  }

  /** q259: exact dedup ON INGEST, driver-verified — the corpus arrives
    * over micro-batches through [[StreamingOps.dedupOnIngest]] (streaming
    * `dropDuplicates` keeps the seen-fingerprint set as cross-batch
    * operator state), and the emitted survivors are folded to
    * (fingerprint, n_emitted). The oracle pins every distinct normalized
    * content to EXACTLY ONE emission: if the cross-batch state ever
    * leaked (a fingerprint re-admitted in a later micro-batch),
    * n_emitted would read 2 and the hash would fail — so the driver's
    * gate, not just a spec, proves the streaming dedup equals batch
    * q30's semantics. The fingerprint grain (rather than the survivor
    * doc ids) is deliberate: within one micro-batch `dropDuplicates`
    * keeps an arbitrary member of a tie, so the SET of fingerprints is
    * the deterministic contract, matching what batch dedup guarantees
    * under partition-order freedom.
    */
  def q259StreamDedup(spark: SparkSession, dir: String): DataFrame =
    // maxChunk 4096 (vs q75's 1024): still bounded driver memory (~4 MB
    // of text per chunk), 4× fewer micro-batch barriers on big fixtures;
    // at gate scale (sf0.01) the ceil(n/4) split is identical either way
    runChunked(spark, dir, "graft_q259_survivors",
      df => StreamingOps.dedupOnIngest(df, "text"), maxChunk = 4096)
      .select(md5(graft.functions.TextFunctions.normText(col("text"))).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n_emitted"))

  /** q267: per-key streaming EWMA, driver-verified — the events table
    * arrives time-ordered over micro-batches through
    * [[StreamingOps.ewmaPerKey]] (mapGroupsWithState, O(1) state per
    * user), and each user's FINAL state (the max-n update) is compared
    * against the DuckDB batch fold over the full history. The operator
    * applies the identical IEEE steps (e' = e/2 + x/2) the batch fold
    * does, so the stream's final answer is BIT-equal to the oracle —
    * the driver's hash, not just `StreamingSpec`, now pins the
    * stateful-streaming surface's exactness. Feed order is the global
    * (ts, event_id) sort, so per-key delivery is in-order (the
    * operator's declared contract; out-of-order handling is the
    * watermarked variant's job).
    */
  def q267StreamEwma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val sink = "graft_q267_ewma"
    spark.catalog.dropTempView(sink)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[StreamingOps.ValEvent]
      .sort("ts", "event_id")
    val ms = MemoryStream[StreamingOps.ValEvent](spark)
    val q = StreamingOps.ewmaPerKey(ms.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    try {
      // 16384-event chunks: still bounded driver memory; the per-batch
      // cost is the state-store pass over every ACTIVE key, so batch
      // count — not batch size — dominates the harness cost at scale
      ev.toLocalIterator().asScala.grouped(16384).foreach { batch =>
        ms.addData(batch.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(sink)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("ewma"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.ewma").as("ewma"))
  }

  /** q284: per-key streaming Holt (level, trend) state, driver-verified
    * — q267's gate for the COUPLED two-variable fold: the same
    * time-ordered feed through [[StreamingOps.holtPerKey]]
    * (mapGroupsWithState, O(1) (l, b, n) per user), final state
    * compared bit-for-bit against the batch recurrence. The oracle
    * walks the identical IEEE steps per key with a RECURSIVE CTE —
    * DuckDB's `list_reduce` rebinds struct accumulator fields
    * mid-row, so the coupled fold cannot be a list lambda there
    * (the q251 engine-difference finding, now pinned by the driver's
    * hash on every key's final state).
    */
  def q284StreamHolt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val sink = "graft_q284_holt"
    spark.catalog.dropTempView(sink)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[StreamingOps.ValEvent]
      .sort("ts", "event_id")
    val ms = MemoryStream[StreamingOps.ValEvent](spark)
    val q = StreamingOps.holtPerKey(ms.toDS())
      .writeStream.format("memory").queryName(sink).outputMode("update").start()
    try {
      ev.toLocalIterator().asScala.grouped(16384).foreach { batch =>
        ms.addData(batch.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(sink)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("level"), col("trend"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.level").as("level"), col("m.trend").as("trend"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q259_stream_dedup" -> (q259StreamDedup _),
    "q267_stream_ewma" -> (q267StreamEwma _),
    "q284_stream_holt" -> (q284StreamHolt _))

  val oracleSql: Map[String, String] = Map(
    // one emission per distinct normalized content — the batch q30
    // grain; any cross-batch state leak shows up as n_emitted = 2
    "q259_stream_dedup" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |       CAST(1 AS BIGINT) AS n_emitted
        |FROM documents GROUP BY 1""".stripMargin,
    // the batch fold over the full per-user history — list_reduce seeds
    // from the first element exactly as the stream state seeds from the
    // first event, and e/2 + x/2 is the identical IEEE step, so the
    // streamed final state must BIT-equal this
    "q267_stream_ewma" ->
      """SELECT user_id, count(*) AS n_events,
        |       list_reduce(list(value ORDER BY ts, event_id),
        |                   (acc, x) -> acc / 2 + x / 2) AS ewma
        |FROM events GROUP BY user_id""".stripMargin,
    // the identical coupled IEEE steps walked per key by a recursive
    // CTE (a struct list_reduce would rebind l mid-row — q251 finding)
    "q284_stream_holt" ->
      """WITH RECURSIVE ser AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS xs,
        |         count(*) AS n
        |  FROM events GROUP BY user_id),
        |fold AS (
        |  SELECT user_id, 1 AS i, xs[1] AS l, CAST(0 AS DOUBLE) AS b
        |  FROM ser
        |  UNION ALL
        |  SELECT f.user_id, f.i + 1,
        |         (s.xs[CAST(f.i + 1 AS INT)] + f.l + f.b) / 2,
        |         ((s.xs[CAST(f.i + 1 AS INT)] + f.l + f.b) / 2 - f.l + f.b) / 2
        |  FROM fold f JOIN ser s ON s.user_id = f.user_id
        |  WHERE f.i < s.n)
        |SELECT f.user_id, CAST(s.n AS BIGINT) AS n_events,
        |       f.l AS level, f.b AS trend
        |FROM fold f JOIN ser s USING (user_id) WHERE f.i = s.n""".stripMargin)
}
