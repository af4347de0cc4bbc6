package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-16 work:
  *   - q376's HLL merge is exact at the REGISTER level (the driver
  *     oracle proves the estimate; the spec pins the stronger claim —
  *     the merged register TABLE equals the whole-corpus one row for
  *     row, which is what makes the estimate equality non-accidental);
  *   - the unigram-LM Viterbi kernel (q377 E-step / q378 apply) is
  *     OPTIMAL (brute-force-checked against every segmentation of the
  *     fixture vocabulary's words), total (OOV single chars take the
  *     UNK path; pieces always concatenate back to the word), and
  *     deterministic on ties (smallest split j — the longest final
  *     piece);
  *   - the q377 learner retains the full alphabet at count ≥ 1 and
  *     never emits a zero-count or overlong piece.
  */
class Round16Spec extends AnyFunSuite with SparkTestBase {

  // ---- q376: HLL register-algebra merge ----

  test("q376: per-shard registers merged by max EQUAL the global register table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = graft.operators.Tokenizer.tokens(docs, "text", Seq("lang"))
      .select(col("lang"), col("word"))
    val global = graft.queries.ReferenceQueries.hllRanks(toks.select("word"))
      .groupBy("j").agg(max(col("rank")).as("m_j"))
    val merged = graft.queries.ReferenceQueries.hllRanks(toks)
      .groupBy("lang", "j").agg(max(col("rank")).as("m_j"))
      .groupBy("j").agg(max(col("m_j")).as("m_j"))
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty,
      "merged shard registers must equal the whole-corpus registers")
  }

  // ---- unigram-LM Viterbi kernel (q377/q378) ----

  private def encode(word: String, vocab: Seq[(String, Long)]): Seq[String] = {
    val df = spark.createDataFrame(Seq(Tuple1(word))).toDF("word")
    df.select(element_at(
        graft.functions.UnigramEncode(array(col("word")), vocab), 1).as("seg"))
      .collect().head.getSeq[String](0)
  }

  private def segScore(pieces: Seq[String], lp: Map[String, Long]): Long =
    pieces.map(p => lp.getOrElse(p,
      if (p.length == 1) graft.functions.UnigramEncode.UnkLp
      else Long.MinValue / 4)).sum

  /** All segmentations of `word` into pieces of length ≤ maxLen whose
    * multi-char pieces are all in-vocab (single chars may be OOV/UNK).
    */
  private def allSegs(word: String, lp: Map[String, Long], maxLen: Int)
      : Seq[Seq[String]] =
    if (word.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, word.length)).flatMap { l =>
      val head = word.substring(0, l)
      if (l == 1 || lp.contains(head))
        allSegs(word.substring(l), lp, maxLen).map(head +: _)
      else Nil
    }

  test("Viterbi kernel is optimal: brute-force over every fixture-word segmentation") {
    val corpus = graft.queries.TextQueries.bpeSeed(spark, sfDir)
      .select("word").collect().map(_.getString(0))
      .filter(_.length <= 12) // 2^(n-1) enumerations; plenty remain
    // adversarial synthetics: cross-boundary concatenations of corpus
    // prefixes, where the greedy-looking choice at the seam is wrong
    val synth = for {
      a <- corpus.take(12); b <- corpus.take(12)
    } yield (a.take(6) + b.take(6)).take(12)
    val words = (corpus ++ synth).distinct
    assert(words.length > 100, s"fixture too small: ${words.length} words")
    val vocab = graft.queries.TextQueries.unigramVocab(spark, sfDir)
      .map { case (p, _, l) => (p, l) }
    val lp = vocab.toMap
    val df = spark.createDataFrame(words.toSeq.map(Tuple1(_))).toDF("word")
    val enc = df.select(col("word"), element_at(
        graft.functions.UnigramEncode(array(col("word")), vocab), 1).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      val got = enc(w)
      assert(got.mkString("") == w, s"pieces must concatenate back: $w -> $got")
      val best = allSegs(w, lp, 4).map(segScore(_, lp)).max
      assert(segScore(got, lp) == best,
        s"$w: kernel score ${segScore(got, lp)} != brute-force best $best ($got)")
    }
  }

  // ---- q379/q380: plan -> apply composition ----

  test("q379 render parts carry exactly the plan's p/m/s token counts and rebuild the stream") {
    val plan = graft.queries.TextQueries.queries("q372_fim_plan")(spark, sfDir)
      .select("doc_id", "p_len", "m_len", "s_len")
    val render = graft.queries.TextQueries.queries("q379_fim_apply")(spark, sfDir)
    def nTok(c: String) = // tokens in a ' '-joined render ('' = 0)
      when(col(c) === "", 0L)
        .otherwise(size(split(col(c), " ")).cast("long"))
    val joined = render.join(plan, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        nTok("prefix").as("np"), nTok("middle").as("nm"), nTok("suffix").as("ns"),
        col("p_len"), col("m_len"), col("s_len"),
        concat_ws(" ",
          when(col("prefix") === "", null).otherwise(col("prefix")),
          when(col("middle") === "", null).otherwise(col("middle")),
          when(col("suffix") === "", null).otherwise(col("suffix"))).as("rebuilt"))
    val bad = joined.filter(
      col("np") =!= col("p_len") || col("nm") =!= col("m_len") ||
      col("ns") =!= col("s_len") ||
      col("np") + col("nm") + col("ns") =!= col("n_tokens"))
    assert(bad.isEmpty, s"part-length mismatch: ${bad.collect().take(3).mkString}")
    // the three parts concatenate back to the original cleaned stream
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.functions.TextFunctions.wordsArr(col("text"))).as("orig"))
    val drift = joined.join(orig, Seq("doc_id"))
      .filter(col("rebuilt") =!= col("orig"))
    assert(drift.isEmpty,
      s"render does not rebuild the stream: ${drift.select("doc_id").collect().take(3).mkString}")
  }

  test("q380 mass balance: n_corrupted = n - 2*masks, n_target = 4*masks, sentinels match q364") {
    val r = graft.queries.TextQueries
      .queries("q380_span_corruption_apply")(spark, sfDir)
    val bad = r.filter(
      col("n_corrupted") =!= col("n_tokens") - col("n_masks") * 2L ||
      col("n_target") =!= col("n_masks") * 4L)
    assert(bad.isEmpty, s"mass balance broken: ${bad.collect().take(3).mkString}")
    // mask count per doc equals the q364 plan's span count (zero for
    // docs the plan skips entirely)
    val plan = graft.queries.TextQueries.queries("q364_span_corruption")(spark, sfDir)
      .groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    val drift = r.join(plan, Seq("doc_id"), "left")
      .filter(col("n_masks") =!= coalesce(col("n_spans"), lit(0L)))
    assert(drift.isEmpty, s"q364/q380 span-count drift: ${drift.collect().take(3).mkString}")
  }

  test("Viterbi tie-break: equal-score split goes to the smallest j (longest final piece)") {
    // "abc": [ab, c] and [a, bc] both score -30; j=1 (split after 'a')
    // beats j=2, so the kernel must return [a, bc]
    val vocab = Seq[(String, Long)](("ab", -10L), ("c", -20L), ("a", -15L), ("bc", -15L))
    assert(encode("abc", vocab) == Seq("a", "bc"))
  }

  test("Viterbi UNK path: OOV single chars segment alone; OOV spans never win") {
    val vocab = Seq[(String, Long)](("a", -5L), ("aa", -7L))
    assert(encode("axa", vocab) == Seq("a", "x", "a"))
    // a real piece always beats UNK: 'aa' (one piece, -7) vs two UNKs
    assert(encode("aaxx", vocab) == Seq("aa", "x", "x"))
    // wholly-OOV word: every char takes the UNK path
    assert(encode("zq", vocab) == Seq("z", "q"))
  }

  test("q377 learner: full alphabet retained at count >= 1, no zero-count or overlong piece") {
    val vocab = graft.queries.TextQueries.unigramVocab(spark, sfDir)
    val pieces = vocab.map(_._1).toSet
    val alphabet = graft.queries.TextQueries.bpeSeed(spark, sfDir)
      .select("word").collect().flatMap(_.getString(0)).toSet
    assert(alphabet.forall(c => pieces.contains(c.toString)),
      s"missing alphabet chars: ${alphabet.filterNot(c => pieces.contains(c.toString))}")
    vocab.foreach { case (p, cnt, lpq) =>
      assert(cnt >= 1L, s"$p has count $cnt")
      assert(p.length >= 1 && p.length <= 4, s"overlong piece $p")
      assert(lpq < 0L, s"$p logp_q $lpq must be negative")
    }
  }
}
