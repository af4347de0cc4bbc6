package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Tokenizer

/** SURVEY §2.3 declared query inventory — the reference's semantics
  * (tokenize → clean → dedup → index) exposed as six queries over the
  * driver `documents` Parquet table, each with a DuckDB-equivalent oracle.
  *
  * Column names are aligned 1:1 with the oracle SQL (the driver compare
  * sorts columns by name before hashing).
  */
object ReferenceQueries {

  private def documents(spark: SparkSession, dir: String): DataFrame =
    // the tokenizer/HLL register builds above this scan are per-row
    // heavy; see ScanSpread
    graft.sources.ScanSpread.spread(
      spark.read.parquet(s"$dir/documents.parquet"))

  /** Raw (doc_id, word) token stream — reference O3-O5. */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    Tokenizer.tokens(documents(spark, dir), "text", Seq("doc_id"))

  /** Distinct (doc_id, word) — reference O6 per-doc dedup. */
  def docWords(spark: SparkSession, dir: String): DataFrame =
    Tokenizer.docWords(documents(spark, dir), "text", "doc_id")

  /** Q1: the inverted index itself — word → space-joined ascending distinct
    * doc IDs (string-rendered for engine-agnostic comparison) + df.
    * Aggregates the RAW token stream: collect_set dedups, so no separate
    * dropDuplicates exchange (one shuffle total — the map-side partial
    * collect_set is the reference's per-doc partial_map dedup).
    */
  def q1InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    tokens(spark, dir)
      .groupBy("word")
      .agg(sort_array(collect_set(col("doc_id"))).as("p"))
      .select(
        col("word"),
        array_join(col("p"), " ").as("postings"),
        size(col("p")).cast("long").as("df"))

  /** Q2: vocabulary size. */
  def q2Vocabulary(spark: SparkSession, dir: String): DataFrame =
    docWords(spark, dir).agg(countDistinct(col("word")).as("vocab"))

  /** Q3: document frequency per word. */
  def q3DocFrequency(spark: SparkSession, dir: String): DataFrame =
    docWords(spark, dir).groupBy("word")
      .agg(count(col("doc_id")).as("df"))

  /** Q4: distinct-word histogram by first letter (exposes the 26-bucket
    * skew the reference hardcodes — reference O9).
    */
  def q4LetterHistogram(spark: SparkSession, dir: String): DataFrame =
    docWords(spark, dir)
      .select(substring(col("word"), 1, 1).as("letter"), col("word"))
      .distinct()
      .groupBy("letter")
      .agg(count(lit(1)).as("words"))

  /** Q5: top-100 words by (df desc, word asc) — reference O12 ordering. */
  def q5TopKByDf(spark: SparkSession, dir: String): DataFrame =
    q3DocFrequency(spark, dir)
      .orderBy(col("df").desc, col("word").asc)
      .limit(100)

  /** Q6: per-document token statistics (total + unique tokens). */
  def q6DocTokenStats(spark: SparkSession, dir: String): DataFrame =
    tokens(spark, dir)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("tokens"),
        countDistinct(col("word")).as("uniques"))

  /** Q7: sketched vocabulary — an md5-derived HyperLogLog distinct-word
    * estimate, the constant-memory alternative to Q2 at corpus scale,
    * rebuilt on the q93/q113 sketch discipline so the estimate is fully
    * oracle-checkable (it was the last rows-only entry: Spark's
    * `approx_count_distinct` seeds engine-internal xxHash64, which no
    * other engine can replay).
    *
    * Flajolet HLL with m = 4096 registers (p = 12, ~1.6% standard
    * error): per token, register j = first 3 md5 hex digits, and the
    * rank is the leading-zero count of the next 13 hex digits (52 bits)
    * plus one — `53 − length(bin(w))`, CAPPED at 50 so the harmonic
    * terms quantize exactly (see below; P(rank > 50) = 2⁻⁵⁰ — the cap
    * is the totality guard, not a live path). The harmonic sum is kept
    * EXACT: Σ 2^(−M[j]) is computed as the integer Σ 2^(50 − M[j])
    * (empty registers contribute 2⁵⁰ each; max total 4096·2⁵⁰ = 2⁶²,
    * Int64-safe), so the only floating-point ops are the final
    * α·m²·2⁵⁰/S division — multiplications by powers of two, exact in
    * IEEE — and the small-range branch's one `ln` (linear counting
    * E = m·ln(m/V) when E_raw ≤ 2.5m and V > 0, Flajolet §4), both
    * reproduced verbatim in the DuckDB oracle and 4dp-rounded.
    *
    * Scale shape: ONE narrow token projection → ONE 4096-group hash
    * aggregation (map-side partial max — duplicate words fold away
    * before the exchange; no vocabulary-grain DISTINCT shuffle) → a
    * 1-row fold. Constant memory at any corpus size — the HLL promise,
    * now with the estimate itself in the driver-gate contract.
    */
  def q7ApproxVocabulary(spark: SparkSession, dir: String): DataFrame =
    md5Hll(tokens(spark, dir).select("word"))

  /** The md5-HLL core over any single-`word`-column relation — factored
    * so the spec can drive the harmonic (raw-estimate) branch at a
    * cardinality far above q7's 31-word fixture vocabulary, where the
    * linear-counting branch is the live one. Split into the REGISTER
    * stage and the ESTIMATE fold so the grouped (q369) and streaming
    * (q370) forms share the exact arithmetic: q369 runs `hllRanks` +
    * the same max-agg with a group key prepended; q370 runs the
    * register agg as a complete-mode streaming aggregation and
    * `hllFold` over the sink.
    */
  private[graft] def md5Hll(values: DataFrame): DataFrame =
    hllFold(hllRanks(values)
      .groupBy("j").agg(max(col("rank")).as("m_j")))

  /** Per-token (register index, capped leading-zero rank): j = first 3
    * md5 hex digits (m = 4096), rank = 53 − length(bin(next 13 hex)),
    * capped at 50 so the harmonic terms quantize exactly (Int64 2⁶²
    * bound; P(rank > 50) = 2⁻⁵⁰ — totality, not a live path).
    * Extra columns (e.g. a group key) pass through.
    */
  private[graft] def hllRanks(values: DataFrame): DataFrame = {
    val h = md5(col("word"))
    val w = conv(substring(h, 4, 13), 16, 10).cast("long")
    values
      .withColumn("j", conv(substring(h, 1, 3), 16, 10).cast("int"))
      .withColumn("rank", when(w === 0L, lit(50))
        .otherwise(least(lit(53) - length(bin(w)), lit(50))))
      .drop("word")
  }

  /** The estimate fold over a `(j, m_j)` register relation (one row per
    * NON-EMPTY register): exact Int64 harmonic sum with empty registers
    * at 2⁵⁰, α·m²·2⁵⁰/S raw estimate, m·ln(m/V) linear-counting branch.
    * `keys` non-empty folds per group (the q369 per-language form);
    * empty folds globally (q7). Group keys lead the output columns.
    */
  private[graft] def hllFold(regs: DataFrame, keys: Seq[String] = Nil): DataFrame = {
    val m = 4096
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val pow250 = lit(1125899906842624.0) // 2^50, exact in IEEE
    val nReg = count(lit(1)).as("n_registers")
    val sOcc = sum(expr("shiftleft(1L, 50 - m_j)")).as("s_occ")
    val agged =
      if (keys.isEmpty) regs.agg(nReg, sOcc)
      else regs.groupBy(keys.map(col): _*).agg(nReg, sOcc)
    val kc = keys.map(col)
    val raw = alpha * lit(m.toDouble) * lit(m.toDouble) * pow250 /
      col("s_quant").cast("double")
    agged
      .select(kc ++ Seq(
        col("n_registers"),
        (lit(m.toLong) - col("n_registers")).as("v_empty"),
        (col("s_occ") + (lit(m.toLong) - col("n_registers")) *
          pow250.cast("long")).as("s_quant")): _*)
      .select(kc ++ Seq(
        // rounded corrected estimate FIRST after the keys: the spec
        // drift pin and the tolerance specs read q7's estimate
        // positionally as getLong(0)
        round(when(raw <= lit(2.5 * m) && col("v_empty") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
          .otherwise(raw)).cast("long").as("approx_vocab"),
        round(raw, 4).as("est_raw"),
        col("n_registers"), col("v_empty"), col("s_quant")): _*)
  }

  /** Q369: per-language vocabulary HLL — q7's md5 sketch at the GROUP
    * grain: one cardinality estimate per language shard, the
    * multilingual audit beside q363's fertility (a vocabulary budget
    * is allocated per language; the estimate is what the allocation
    * reads at corpus scale, where per-language exact DISTINCT is a
    * vocabulary-sized shuffle per shard). Same register/rank/fold
    * arithmetic as q7 — `hllRanks` + the max-agg with the group key
    * prepended + the keyed `hllFold` — so the grouped form can never
    * drift from the verified global one. Scale shape: the language
    * column rides THROUGH tokenization (document-local — at corpus
    * scale a doc_id join of the token stream back to the doc-grain
    * language table would shuffle every token), then ONE (lang, j)
    * hash agg (≤ |langs|·4096 rows, map-side partial max), a
    * |langs|-row fold. Zero joins.
    */
  def q369HllPerLang(spark: SparkSession, dir: String): DataFrame = {
    val ranks = hllRanks(
      Tokenizer.tokens(documents(spark, dir), "text", Seq("lang"))
        .select(col("lang"), col("word")))
    hllFold(
      ranks.groupBy("lang", "j").agg(max(col("rank")).as("m_j")),
      keys = Seq("lang"))
  }

  /** Q73: KMV (k-minimum-values) vocabulary estimate — the DETERMINISTIC
    * cardinality sketch next to Q7's HLL: take the k smallest md5(word)
    * values; estimate = (k-1) / (max-of-k as a [0,1) fraction). Because
    * the "randomness" is md5, the sketch is reproducible in any engine —
    * the only oracle-checkable way to verify sketch logic. Scale: the
    * global k-smallest is `TakeOrdered` (k per partition, driver merge
    * of k·partitions values) — never a full sort.
    */
  def q73KmvVocab(spark: SparkSession, dir: String): DataFrame = {
    val k = 16
    val kmv = docWords(spark, dir)
      .select(md5(col("word")).as("h")).distinct()
      .orderBy(col("h").asc).limit(k)
    kmv.agg(max(col("h")).as("hmax"), count(lit(1)).as("k_actual"))
      .select(
        col("k_actual"),
        round(
          (col("k_actual") - 1).cast("double") /
            (conv(substring(col("hmax"), 1, 8), 16, 10).cast("double") / 4294967296.0),
          6).as("est_vocab"))
  }

  /** Q235: postings-length histogram — the vocabulary bucketed by
    * ⌊log2(df)⌋ with word and total-postings counts per bucket: the
    * index-statistics readout that sizes compression (q76's delta-varint
    * wins on the long tail) and flags the stop-word head that dominates
    * shard bytes. DETERMINISM: the bucket is `length(bin(df)) − 1` —
    * pure integer/string arithmetic, no floating log to drift at
    * power-of-two boundaries. Scale: q3's vocab-sized df table folded to
    * ≤ log2(N) rows.
    */
  def q235PostingsHistogram(spark: SparkSession, dir: String): DataFrame =
    q3DocFrequency(spark, dir)
      .select(col("df"), (length(bin(col("df"))) - 1).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_words"), sum(col("df")).as("n_postings"))
      .select(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").as("df_lo"),
        col("n_words"), col("n_postings"))

  /** Q236: letter-shard balance audit — per first letter: vocabulary
    * size, postings entries, and each shard's share of total postings —
    * the load-balance measurement for the reference's hardcoded 26-way
    * reduce partition (O9/O11): q4 counts words per letter, this
    * measures the BYTES-proportional axis (postings) that actually
    * determines reduce-side runtime skew. DETERMINISM: exact integer
    * counts, one division per row. Scale: two vocab-sized aggs.
    */
  def q236ShardBalance(spark: SparkSession, dir: String): DataFrame = {
    val perLetter = q3DocFrequency(spark, dir)
      .groupBy(substring(col("word"), 1, 1).as("letter"))
      .agg(count(lit(1)).as("n_words"), sum(col("df")).as("n_postings"))
    perLetter
      .crossJoin(broadcast(perLetter.agg(sum(col("n_postings")).as("tot"))))
      .select(col("letter"), col("n_words"), col("n_postings"),
        round(col("n_postings").cast("double") / col("tot"), 6).as("share"))
  }

  /** Q376: HLL register-algebra MERGE — the mergeability a sharded
    * deployment actually relies on, driver-proven: take q369's
    * per-language register tables (language = an arbitrary disjoint
    * sharding of the token stream — any executor/shard partition has
    * the same algebra) and fold them into ONE sketch by the register
    * max, `M[j] = max over shards of M_shard[j]`, then run q7's
    * estimate fold. Because per-shard registers are themselves maxes
    * over their shard's tokens, the merged table IS the whole-corpus
    * register table — so this query's oracle is q7's SQL over the
    * unioned corpus VERBATIM: the driver hash row is the proof that
    * merged shard sketches EQUAL the global sketch (the q213 KMV
    * `__merged` / q250 set-algebra discipline applied to HLL).
    * Scale shape: the shard registers are ≤ |shards|·4096 rows; the
    * merge is a 4096-group agg over that bounded table — shard
    * locally, merge centrally, never re-scan the corpus.
    */
  def q376HllMergeShards(spark: SparkSession, dir: String): DataFrame = {
    val shardRegs = hllRanks(
      Tokenizer.tokens(documents(spark, dir), "text", Seq("lang"))
        .select(col("lang"), col("word")))
      .groupBy("lang", "j").agg(max(col("rank")).as("m_j"))
    hllFold(shardRegs.groupBy("j").agg(max(col("m_j")).as("m_j")))
  }

  /** q383: HLL INTERSECTION via register algebra — the set-operation
    * member of the sketch family (q376 proves union-by-max; this
    * composes it): estimated shared vocabulary between the 'en' and
    * 'de' shards by inclusion–exclusion, |A∩B| ≈ est(A) + est(B) −
    * est(A∪B), plus the implied Jaccard in 1e6 fixed point — the
    * cheap cross-shard overlap readout (which crawls/languages share
    * vocabulary, is a shard worth deduping against another) that
    * needs only the ≤4096-row register tables, never the corpora.
    * est(A∪B) comes from max-merged registers (q376's algebra), so
    * all three estimates derive from ONE register build over the
    * filtered token stream. The intersection estimate may be negative
    * at tiny overlaps (standard inclusion–exclusion sketch error —
    * kept raw, deterministically). Scale shape: one token scan with
    * the lang key riding through (q369's join-free analysis), three
    * ≤4096-row folds; the combine is three 1-row broadcasts.
    */
  def q383HllIntersectLangs(spark: SparkSession, dir: String): DataFrame = {
    val regs = hllRanks(
      Tokenizer.tokens(
        documents(spark, dir).filter(col("lang").isin("en", "de")),
        "text", Seq("lang"))
        .select(col("lang"), col("word")))
      .groupBy("lang", "j").agg(max(col("rank")).as("m_j"))
      .persist() // three folds read it; runner releases (SparkEntry contract)
    val ab = hllFold(regs, keys = Seq("lang"))
      .select(col("lang"), col("approx_vocab"))
    val a = ab.filter(col("lang") === "en")
      .select(col("approx_vocab").as("est_en"))
    val b = ab.filter(col("lang") === "de")
      .select(col("approx_vocab").as("est_de"))
    val u = hllFold(regs.groupBy("j").agg(max(col("m_j")).as("m_j")))
      .select(col("approx_vocab").as("est_union"))
    a.crossJoin(b).crossJoin(u)
      .select(col("est_en"), col("est_de"), col("est_union"),
        (col("est_en") + col("est_de") - col("est_union")).as("est_intersect"),
        round((col("est_en") + col("est_de") - col("est_union")).cast("double")
          / col("est_union") * 1e6).cast("long").as("jaccard_q"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q235_postings_histogram" -> q235PostingsHistogram _,
    "q236_shard_balance" -> q236ShardBalance _,
    "q7_approx_vocab" -> q7ApproxVocabulary _,
    "q369_hll_per_lang" -> q369HllPerLang _,
    "q376_hll_merge_shards" -> q376HllMergeShards _,
    "q383_hll_intersect_langs" -> q383HllIntersectLangs _,
    "q73_kmv_vocab" -> q73KmvVocab _,
    "q1_inverted_index" -> q1InvertedIndex _,
    "q2_vocabulary" -> q2Vocabulary _,
    "q3_doc_frequency" -> q3DocFrequency _,
    "q4_letter_histogram" -> q4LetterHistogram _,
    "q5_topk_df" -> q5TopKByDf _,
    "q6_doc_token_stats" -> q6DocTokenStats _)

  /** DuckDB-dialect tokenizer CTEs shared by the oracles below. `toks` is
    * the raw token stream, `dw` the per-doc distinct words — both with the
    * reference's exact clean/lower/join semantics.
    */
  private val TokCte =
    """WITH raw AS (
      |  SELECT doc_id,
      |         lower(regexp_replace(unnest(string_split_regex(text, '\s+')), '[^A-Za-z]', '', 'g')) AS word
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, word FROM raw WHERE length(word) > 0
      |), dw AS (
      |  SELECT DISTINCT doc_id, word FROM toks
      |)""".stripMargin

  /** q7's full whole-corpus HLL replay — factored because it is the
    * oracle for BOTH q7 (the global sketch) and q376 (the shard-merged
    * sketch, which must hash-equal it).
    */
  private val Q7HllSql =
    s"""$TokCte,
       |hh AS (
       |  SELECT CAST(('0x' || substr(md5(word), 1, 3)) AS BIGINT) AS j,
       |         CAST(('0x' || substr(md5(word), 4, 13)) AS BIGINT) AS w
       |  FROM toks),
       |regs AS (
       |  SELECT j, max(CASE WHEN w = 0 THEN 50
       |                     ELSE least(53 - length(bin(w)), 50) END) AS m_j
       |  FROM hh GROUP BY j),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_registers,
       |         CAST(sum(CAST(1 AS BIGINT) << CAST(50 - m_j AS INT)) AS BIGINT)
       |           AS s_occ
       |  FROM regs),
       |qn AS (
       |  SELECT n_registers, 4096 - n_registers AS v_empty,
       |         s_occ + (4096 - n_registers) * CAST(1125899906842624 AS BIGINT)
       |           AS s_quant
       |  FROM st),
       |e AS (
       |  SELECT n_registers, v_empty, s_quant,
       |         (CAST(0.7213 AS DOUBLE) /
       |            (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
       |           * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
       |           * CAST(1125899906842624.0 AS DOUBLE) / CAST(s_quant AS DOUBLE) AS raw
       |  FROM qn)
       |SELECT CAST(round(CASE WHEN raw <= CAST(10240.0 AS DOUBLE) AND v_empty > 0
       |                       THEN CAST(4096.0 AS DOUBLE) *
       |                            ln(CAST(4096.0 AS DOUBLE) / CAST(v_empty AS DOUBLE))
       |                       ELSE raw END) AS BIGINT) AS approx_vocab,
       |       round(raw, 4) AS est_raw,
       |       n_registers, v_empty, s_quant
       |FROM e""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // same length(bin(df))-1 integer bucket, same 2^bucket lower bound
    "q235_postings_histogram" ->
      s"""$TokCte,
         |dfx AS (SELECT word, count(*) AS df FROM dw GROUP BY word),
         |h AS (
         |  SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS bucket,
         |         count(*) AS n_words, CAST(sum(df) AS BIGINT) AS n_postings
         |  FROM dfx GROUP BY 1)
         |SELECT (1::BIGINT << bucket) AS df_lo, n_words, n_postings
         |FROM h""".stripMargin,
    // same per-letter postings mass, same share-of-total division
    "q236_shard_balance" ->
      s"""$TokCte,
         |dfx AS (SELECT word, count(*) AS df FROM dw GROUP BY word),
         |pl AS (
         |  SELECT substr(word, 1, 1) AS letter, count(*) AS n_words,
         |         CAST(sum(df) AS BIGINT) AS n_postings
         |  FROM dfx GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_postings) AS BIGINT) AS tot FROM pl)
         |SELECT letter, n_words, n_postings,
         |       round(n_postings * 1.0 / tot.tot, 6) AS share
         |FROM pl CROSS JOIN tot""".stripMargin,
    // the INDEPENDENT HLL replay (q93/q113's md5-arithmetic discipline):
    // same register index (first 3 md5 hex), same capped leading-zero
    // rank off the next 13 hex, same exact integer harmonic sum
    // (Σ 2^(50−M[j]), empty registers at 2^50), same α·m²·2^50/S raw
    // estimate and m·ln(m/V) linear-counting branch — every float op
    // double-typed explicitly (DuckDB parses bare decimal literals as
    // DECIMAL, whose division semantics differ from Spark's doubles)
    "q7_approx_vocab" -> Q7HllSql,
    // q376's oracle IS q7's whole-corpus SQL: the shard-merged sketch
    // must hash-equal the global sketch — the mergeability proof
    "q376_hll_merge_shards" -> Q7HllSql,
    // q7's replay with the language key threaded through every stage
    "q369_hll_per_lang" ->
      s"""$TokCte,
         |lt AS (
         |  SELECT d.lang, t.word FROM toks t JOIN documents d USING (doc_id)),
         |hh AS (
         |  SELECT lang,
         |         CAST(('0x' || substr(md5(word), 1, 3)) AS BIGINT) AS j,
         |         CAST(('0x' || substr(md5(word), 4, 13)) AS BIGINT) AS w
         |  FROM lt),
         |regs AS (
         |  SELECT lang, j, max(CASE WHEN w = 0 THEN 50
         |                           ELSE least(53 - length(bin(w)), 50) END) AS m_j
         |  FROM hh GROUP BY lang, j),
         |st AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_registers,
         |         CAST(sum(CAST(1 AS BIGINT) << CAST(50 - m_j AS INT)) AS BIGINT)
         |           AS s_occ
         |  FROM regs GROUP BY lang),
         |qn AS (
         |  SELECT lang, n_registers, 4096 - n_registers AS v_empty,
         |         s_occ + (4096 - n_registers) * CAST(1125899906842624 AS BIGINT)
         |           AS s_quant
         |  FROM st),
         |e AS (
         |  SELECT lang, n_registers, v_empty, s_quant,
         |         (CAST(0.7213 AS DOUBLE) /
         |            (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
         |           * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
         |           * CAST(1125899906842624.0 AS DOUBLE) / CAST(s_quant AS DOUBLE) AS raw
         |  FROM qn)
         |SELECT lang,
         |       CAST(round(CASE WHEN raw <= CAST(10240.0 AS DOUBLE) AND v_empty > 0
         |                       THEN CAST(4096.0 AS DOUBLE) *
         |                            ln(CAST(4096.0 AS DOUBLE) / CAST(v_empty AS DOUBLE))
         |                       ELSE raw END) AS BIGINT) AS approx_vocab,
         |       round(raw, 4) AS est_raw,
         |       n_registers, v_empty, s_quant
         |FROM e""".stripMargin,
    // q383: the keyed register build of q369 restricted to the two
    // shards, the q376 max-merge for the union row, q7's estimate
    // arithmetic on all three, inclusion–exclusion at the end
    "q383_hll_intersect_langs" ->
      s"""$TokCte,
         |lt AS (
         |  SELECT d.lang, t.word FROM toks t JOIN documents d USING (doc_id)
         |  WHERE d.lang IN ('en', 'de')),
         |hh AS (
         |  SELECT lang,
         |         CAST(('0x' || substr(md5(word), 1, 3)) AS BIGINT) AS j,
         |         CAST(('0x' || substr(md5(word), 4, 13)) AS BIGINT) AS w
         |  FROM lt),
         |regs AS (
         |  SELECT lang, j, max(CASE WHEN w = 0 THEN 50
         |                           ELSE least(53 - length(bin(w)), 50) END) AS m_j
         |  FROM hh GROUP BY lang, j),
         |ru AS (SELECT j, max(m_j) AS m_j FROM regs GROUP BY j),
         |stl AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_registers,
         |         CAST(sum(CAST(1 AS BIGINT) << CAST(50 - m_j AS INT)) AS BIGINT)
         |           AS s_occ
         |  FROM regs GROUP BY lang
         |  UNION ALL
         |  SELECT '__union', CAST(count(*) AS BIGINT),
         |         CAST(sum(CAST(1 AS BIGINT) << CAST(50 - m_j AS INT)) AS BIGINT)
         |  FROM ru),
         |qn AS (
         |  SELECT lang, n_registers, 4096 - n_registers AS v_empty,
         |         s_occ + (4096 - n_registers) * CAST(1125899906842624 AS BIGINT)
         |           AS s_quant
         |  FROM stl),
         |e AS (
         |  SELECT lang, v_empty,
         |         (CAST(0.7213 AS DOUBLE) /
         |            (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE)))
         |           * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
         |           * CAST(1125899906842624.0 AS DOUBLE) / CAST(s_quant AS DOUBLE) AS raw
         |  FROM qn),
         |est AS (
         |  SELECT lang,
         |         CAST(round(CASE WHEN raw <= CAST(10240.0 AS DOUBLE) AND v_empty > 0
         |                         THEN CAST(4096.0 AS DOUBLE) *
         |                              ln(CAST(4096.0 AS DOUBLE) / CAST(v_empty AS DOUBLE))
         |                         ELSE raw END) AS BIGINT) AS est
         |  FROM e),
         |pv AS (
         |  SELECT max(CASE WHEN lang = 'en' THEN est END) AS est_en,
         |         max(CASE WHEN lang = 'de' THEN est END) AS est_de,
         |         max(CASE WHEN lang = '__union' THEN est END) AS est_union
         |  FROM est)
         |SELECT est_en, est_de, est_union,
         |       est_en + est_de - est_union AS est_intersect,
         |       CAST(round(CAST(est_en + est_de - est_union AS DOUBLE)
         |                  / est_union * 1e6) AS BIGINT) AS jaccard_q
         |FROM pv""".stripMargin,
    "q73_kmv_vocab" ->
      s"""$TokCte,
         |kmv AS (
         |  SELECT DISTINCT md5(word) AS h FROM dw ORDER BY h ASC LIMIT 16)
         |SELECT count(*) AS k_actual,
         |       round((count(*) - 1) * 1.0 /
         |             (CAST(('0x' || substr(max(h), 1, 8)) AS BIGINT) / 4294967296.0),
         |             6) AS est_vocab
         |FROM kmv""".stripMargin,
    "q1_inverted_index" ->
      s"""$TokCte
         |SELECT word,
         |       string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS postings,
         |       count(*) AS df
         |FROM dw GROUP BY word""".stripMargin,
    "q2_vocabulary" ->
      s"$TokCte SELECT count(DISTINCT word) AS vocab FROM dw",
    "q3_doc_frequency" ->
      s"$TokCte SELECT word, count(*) AS df FROM dw GROUP BY word",
    "q4_letter_histogram" ->
      s"""$TokCte
         |SELECT substr(word, 1, 1) AS letter, count(DISTINCT word) AS words
         |FROM dw GROUP BY letter""".stripMargin,
    "q5_topk_df" ->
      s"""$TokCte
         |SELECT word, count(*) AS df FROM dw GROUP BY word
         |ORDER BY df DESC, word ASC LIMIT 100""".stripMargin,
    "q6_doc_token_stats" ->
      s"""$TokCte
         |SELECT doc_id, count(*) AS tokens, count(DISTINCT word) AS uniques
         |FROM toks GROUP BY doc_id""".stripMargin)
}
