package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** End-to-end training-data curation — the composition a 100 TB corpus
  * pipeline actually runs, built from the verified operator pieces:
  *
  *   1. exact dedup: keep only each content group's keeper (min doc_id
  *      over the md5 of the normalized text);
  *   2. quality gate: TextAnalysis.quality boolean gate == 1;
  *   3. language filter: TextAnalysis.langId prediction ∈ `langs`.
  *
  * Plan shape: one narrow projection computes fingerprint + metrics, one
  * hash aggregation finds keepers, one broadcast-or-shuffled semi-join
  * keeps them — no operator here exceeds the cost of its standalone
  * query, and every stage is the same code path the standalone queries
  * verify against DuckDB.
  */
object Curation {

  def curate(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      langs: Seq[String]): DataFrame = {
    // fingerprint only the narrow (fp, id) projection that feeds the
    // keeper aggregation — the semi-join is keyed on the id, so the big
    // side never evaluates the normalize+md5 pass at all
    val keepers = docs
      .select(md5(normText(col(textCol))).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = docs.join(keepers, Seq(idCol), "left_semi")
    TextAnalysis.documentProfile(deduped, textCol, idCol)
      .filter(col("quality_score") === 1 && col("pred_lang").isin(langs: _*))
      .select(col(idCol), col("n_words"), col("pred_lang"))
  }

  /** Cap the number of rows kept per group (e.g. documents per source
    * domain — bounding over-represented sources is a standard corpus
    * curation step). The kept subset is a deterministic pseudo-random
    * choice: rows rank by md5 of their id (id tie-break) within the
    * group, so the selection is stable under re-runs and re-partitioning
    * yet uncorrelated with id order. One window exchange on the group
    * key; rank pruning happens before anything downstream.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    val rk = "__graft_cap_rk" // collision-safe: output schema == input schema
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= k)
      .drop(rk)
  }

  /** Deterministic domain-mixture resampling — the "N epochs of source X"
    * step of a training-data mix: each row is replicated `⌊w⌋` times plus
    * one more when the md5-fraction of its id falls below `w - ⌊w⌋`, where
    * `w` is its group's target weight (`weights`, else `default`). Weights
    * above 1 upsample (epoch replication, an `epoch` column 0..copies-1
    * distinguishes copies), weights in (0,1) downsample, 0 drops the
    * group. Like [[hashSplit]] the choice is a pure function of the id —
    * stable under re-runs, re-partitioning and incremental appends, and
    * the realized mix concentrates tightly around the target weights.
    *
    * Scale shape: a narrow projection + generate — no shuffle, no state;
    * the weight table is a plan literal (real pipelines have O(10-100)
    * sources). The fractional test compares a fixed-width 6-hex-digit md5
    * prefix against `⌊frac·16^6⌋` rendered in hex — exact string compare,
    * identical in any engine.
    */
  def mixSources(
      df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], default: Double): DataFrame = {
    (weights.values.toSeq :+ default).foreach(w =>
      require(w >= 0 && w <= 100, s"mix weight out of range [0,100]: $w"))
    require(!df.columns.contains("epoch"),
      "mixSources emits an 'epoch' column but the input already has one — " +
        "rename or drop it first")
    val prefix = substring(md5(col(idCol).cast("string")), 1, 6)
    def copiesFor(w: Double): Column = {
      val whole = math.floor(w).toLong
      // clamp: a fractional part within half-an-ulp of 1.0 can round to
      // exactly 2^24, whose hex is 7 digits — lexicographically SMALLER
      // than most 6-digit prefixes, which would invert the test and drop
      // ~15/16 of the group instead of keeping it
      val fracBound =
        f"${math.min(math.floor((w - whole) * (1L << 24)).toLong, 0xffffffL)}%06x"
      lit(whole) + when(prefix < fracBound, 1L).otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1).foldRight(copiesFor(default)) {
      case ((g, w), tail) => when(col(groupCol) === g, copiesFor(w)).otherwise(tail)
    }
    val cp = "__graft_mix_copies"
    df.withColumn(cp, copies)
      .filter(col(cp) >= 1) // sequence() needs start <= stop
      .withColumn("epoch", explode(sequence(lit(0L), col(cp) - 1)))
      .drop(cp)
  }

  /** Deterministic sequence packing — the "concatenate documents and cut
    * every `seqLen` tokens" step that turns a curated corpus into fixed-
    * length training sequences (documents straddle sequence boundaries,
    * GPT-style). Documents are routed to `buckets` independent streams by
    * an md5-derived hash of their id (decorrelated from id order, stable
    * under appends), concatenated within each bucket in id order, and the
    * running token count places each document: `seq_id` is the sequence
    * its first token lands in, `tok_offset` its position inside it.
    *
    * Output per row: `(id, bucket, seq_id, tok_offset, n_tok)` — integer
    * arithmetic end to end, so exactly reproducible on any engine. Token
    * counts come from the byte-wise [[graft.functions.AlnumWordCount]]
    * tokenizer shared by the chunking/dedup pipelines.
    *
    * Scale shape: ONE hash exchange on `bucket` + an in-partition sort —
    * the packing itself is a running-sum window. Buckets bound each
    * task's sort at corpus_tokens/buckets; size `buckets` to the cluster
    * (each stream is an independent shard of the packed dataset).
    * `buckets` is REQUIRED — see [[packByCount]] for why the knob is
    * part of the SEMANTICS and must not float with session config.
    */
  def packSequences(
      df: DataFrame, textCol: String, idCol: String,
      seqLen: Int, buckets: Int): DataFrame =
    packByCount(
      df.select(
        col(idCol),
        // null text = zero tokens: the row still packs (at its bucket's
        // current position) instead of poisoning the running sum with null
        coalesce(graft.functions.AlnumWordCount(col(textCol)).cast("long"), lit(0L))
          .as("n_tok")),
      idCol, seqLen, buckets)

  /** The packing CORE behind [[packSequences]], over a PRECOMPUTED
    * per-row token count (`n_tok` long) — one definition of the bucket
    * routing and cut arithmetic, so the q84 word-count form and the
    * q362 learned-tokenizer form (BPE counts from the q360 APPLY) can
    * never drift: same md5 bucket coin, same running sum, same integer
    * DIV/MOD cuts.
    *
    * `buckets` is a SEMANTIC parameter, not just a tuning knob: the
    * bucket coin decides which documents share a packed stream, so two
    * runs with different bucket counts produce different (seq_id,
    * tok_offset) assignments BY DESIGN — and parallelism = buckets,
    * because each stream's running sum is inherently sequential. It is
    * REQUIRED and must be >= 1: a conf-derived default (the pre-round-16
    * behavior) made persisted output silently vary with session config
    * across runs/clusters, which contradicts the framework's determinism
    * discipline. Size it to the cluster. The driver-verified q84/q362
    * rows pin buckets = 8 — fixture-scale values chosen so the DuckDB
    * oracle replays the identical assignment, not a statement about
    * production parallelism.
    */
  def packByCount(
      df: DataFrame, idCol: String, seqLen: Int, buckets: Int): DataFrame = {
    require(seqLen >= 1, "packSequences requires seqLen >= 1")
    require(buckets >= 1,
      "packByCount requires an explicit buckets >= 1: bucket routing is " +
      "part of the output's semantics and must not float with session conf")
    val b = buckets
    import org.apache.spark.sql.expressions.Window
    // first 4 md5 hex digits as an int: plenty of entropy for bucket
    // routing, cheap to mirror in SQL (parse-as-hex % buckets)
    val bucket = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10).cast("int"),
      lit(b))
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), bucket.as("bucket"), col("n_tok"))
      .withColumn("__cum", sum(col("n_tok")).over(w))
      .select(
        col(idCol), col("bucket"),
        // integer DIV, not double /: exact at any corpus token count
        expr(s"(__cum - n_tok) DIV ${seqLen}L").as("seq_id"),
        pmod(col("__cum") - col("n_tok"), lit(seqLen.toLong)).as("tok_offset"),
        col("n_tok"))
  }

  /** Deterministic per-group downsampling: keep each row with its
    * group's probability `rates(group)` (groups absent from `rates`
    * keep everything), decided by the md5-fraction of the row id — the
    * same stateless pure-function-of-the-id coin as [[mixSources]], so
    * the kept set is stable under re-runs, re-partitioning and
    * incremental appends, and two samplings at rates r1 < r2 are NESTED
    * (the r1 sample is a subset of the r2 sample — the property that
    * makes downstream ablations comparable). Rate 1.0 keeps every row
    * exactly (no 1/2^24 edge loss); rate 0.0 drops the group. Pure
    * per-row filter — no shuffle, no state, any corpus size.
    */
  def sampleByRates(
      df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double]): DataFrame = {
    rates.values.foreach(r =>
      require(r >= 0 && r <= 1, s"sample rate out of range [0,1]: $r"))
    val prefix = substring(md5(col(idCol).cast("string")), 1, 6)
    def keepFor(r: Double): Column =
      if (r >= 1.0) lit(true)
      else prefix < f"${math.floor(r * (1L << 24)).toLong}%06x"
    val keep = rates.toSeq.sortBy(_._1).foldRight(lit(true)) {
      case ((g, r), tail) => when(col(groupCol) === g, keepFor(r)).otherwise(tail)
    }
    df.filter(keep)
  }

  /** Deterministic held-out split: route each row to a named fraction of
    * the corpus by the md5 of its id — the standard reproducible
    * train/val/test assignment for a training pipeline (stable under
    * re-runs, re-partitioning, and incremental appends, unlike sampling).
    *
    * `cuts` maps each split name to the EXCLUSIVE upper bound of its
    * bucket range as a 2-hex-digit string, in ascending order; ids whose
    * `md5` prefix falls below the first bound get the first name, and so
    * on; the remainder gets `rest`. Fixed-width lowercase hex compares
    * stably in any engine. Pure per-row projection — no shuffle, no state.
    */
  def hashSplit(
      df: DataFrame, idCol: String,
      cuts: Seq[(String, String)], rest: String): DataFrame = {
    cuts.foreach { case (name, bound) =>
      require(bound.matches("[0-9a-f]{2}"),
        s"hashSplit bound for '$name' must be 2 lowercase hex digits, got '$bound'")
    }
    require(cuts.map(_._2) == cuts.map(_._2).sorted.distinct,
      s"hashSplit bounds must be strictly ascending (later cuts would be " +
        s"unreachable): ${cuts.map(_._2)}")
    // 'split' is the documented OUTPUT column; refuse to silently clobber
    // a pre-existing one rather than guess which the caller wanted
    require(!df.columns.contains("split"),
      "hashSplit emits a 'split' column but the input already has one — " +
        "rename or drop it first")
    val prefix = substring(md5(col(idCol).cast("string")), 1, 2)
    val assigned = cuts.foldRight(lit(rest)) { case ((name, bound), tail) =>
      when(prefix < bound, name).otherwise(tail)
    }
    df.withColumn("split", assigned)
  }
}
