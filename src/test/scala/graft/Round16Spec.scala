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
  *     never emits a zero-count or overlong piece;
  *   - q381's EG trajectory is a complete grid with uniform zero-excess
  *     start, conserves the 1e9 weight mass each round up to
  *     quantization, and moves weight TOWARD higher-excess sources
  *     (the DoReMi update direction, pinned independently of the
  *     oracle's value replay).
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

  // ---- q383: HLL inclusion–exclusion ----

  test("q383 algebra: constructed 100-word overlap recovered by inclusion-exclusion") {
    // the corpus fixture's en/de vocabularies coincide under the
    // reference letter-only tokenizer (complete overlap — the driver
    // gate proves the arithmetic but not the geometry), so the
    // partial-overlap behavior is pinned on a constructed pair:
    // |A| = 200, |B| = 400, |A∩B| = 100 — linear-counting regime,
    // estimates near-exact
    import spark.implicits._
    val a = (1 to 100).map(i => ("A", s"common$i")) ++
      (1 to 100).map(i => ("A", s"onlya$i"))
    val b = (1 to 100).map(i => ("B", s"common$i")) ++
      (1 to 300).map(i => ("B", s"onlyb$i"))
    val regs = graft.queries.ReferenceQueries
      .hllRanks((a ++ b).toDF("lang", "word"))
      .groupBy("lang", "j").agg(max(col("rank")).as("m_j")).persist()
    val ab = graft.queries.ReferenceQueries
      .hllFold(regs, keys = Seq("lang"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val u = graft.queries.ReferenceQueries
      .hllFold(regs.groupBy("j").agg(max(col("m_j")).as("m_j")))
      .collect().head.getLong(0)
    val inter = ab("A") + ab("B") - u
    assert(u >= math.max(ab("A"), ab("B")),
      s"union $u below a shard (${ab("A")}, ${ab("B")})")
    assert(math.abs(inter - 100L) <= 15L,
      s"intersection estimate $inter too far from exact 100 " +
        s"(A=${ab("A")}, B=${ab("B")}, U=$u)")
  }

  // ---- q384: DoReMi resample plan ----

  test("q384: apportionment conserves corpus volume exactly, targets within 1 of quota") {
    val rows = graft.queries.HygieneQueries
      .q384DoremiResamplePlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.map(_._2).sum
    assert(rows.map(_._4).sum == n,
      "largest-remainder apportionment must redistribute EXACTLY the corpus volume")
    val tw = rows.map(_._3).sum.toDouble
    rows.foreach { case (s, _, w, t) =>
      assert(t >= 0L, s"$s negative target")
      val quota = n.toDouble * w / tw
      assert(math.abs(t - quota) < 1.0 + 1e-9,
        s"$s target $t vs quota $quota — outside the Hare-quota band")
    }
  }

  // ---- q381: DoReMi mixture reweighting ----

  test("q381 trajectory: complete grid, uniform start, 1e9 mass, EG monotone in excess") {
    val rows = graft.queries.HygieneQueries.q381DoremiMixture(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val srcs = rows.map(_._2).distinct.sorted
    val k = srcs.length
    assert(k >= 2, "fixture must have several sources")
    assert(rows.length == 6 * k &&
      rows.map(t => (t._1, t._2)).toSet.size == 6 * k,
      "trajectory must be the complete (round x source) grid")
    val r0 = rows.filter(_._1 == 0)
    assert(r0.forall(_._3 == 0L) && r0.map(_._4).distinct.length == 1,
      "round 0 must be zero-excess uniform")
    for (t <- 0 to 5) {
      val rt = rows.filter(_._1 == t)
      val mass = rt.map(_._4).sum
      // each weight is one half-up round (±0.5 each) → drift ≤ ⌈k/2⌉+1
      assert(math.abs(mass - 1000000000L) <= k / 2 + 2,
        s"round $t mass $mass drifts beyond quantization slack")
      if (t >= 1) {
        // the EG update direction: a strictly larger excess never maps
        // to a smaller weight (beyond the ≤1-per-round quantization
        // slack accumulated through w_{t-1}) — hard domains gain data
        val byEx = rt.sortBy(r => (r._3, r._4))
        byEx.sliding(2).foreach { pair =>
          if (pair.length == 2 && pair(1)._3 > pair(0)._3)
            assert(pair(1)._4 >= pair(0)._4 - 5L,
              s"round $t: excess ${pair(1)._3} weight ${pair(1)._4} " +
                s"below excess ${pair(0)._3} weight ${pair(0)._4}")
        }
      }
    }
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
