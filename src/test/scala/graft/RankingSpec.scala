package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Ranking}

/** Search/ranking layer: TF-IDF, BM25, positional index, phrase joins,
  * and the deterministic hash split — invariants beyond the DuckDB
  * oracle comparison (which covers exact values at sf0.01).
  */
class RankingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join beats nested loop join"),
    (2L, "sort merge join"),
    (3L, "table scan only"),
    (4L, "")).toDF("doc_id", "text")

  test("tfidf: rare terms outweigh common ones; df/tf counted exactly") {
    val out = Ranking.tfidf(docs, "text", "doc_id")
      .select("doc_id", "word", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    // 'join' appears twice in doc 1, df=2 across the corpus
    assert(byKey((1L, "join"))._3 == 2 && byKey((1L, "join"))._4 == 2)
    // 'scan' (df=1) must outscore 'join' (df=2) at equal tf
    assert(byKey((3L, "scan"))._5 > byKey((2L, "join"))._5)
    // a term in every non-empty doc would have idf ln(4/3) > 0 (N counts
    // the empty doc too — df can never reach N when a doc has no tokens)
    assert(out.forall(_._5 > 0))
  }

  test("bm25: higher tf ranks higher for same term; dl normalization applies") {
    val out = Ranking.bm25(docs, "text", "doc_id", Seq("join", "scan"))
      .select("doc_id", "word", "bm25").as[(Long, String, Double)].collect()
    val score = out.map(r => (r._1, r._2) -> r._3).toMap
    // doc 1 has tf=2 for 'join', doc 2 tf=1 — but doc 1 is longer (6 words
    // vs 3), so assert the tf effect dominates here (it does: 2.2/1.9 > 1)
    assert(score((1L, "join")) > score((2L, "join")))
    assert(score.keySet == Set((1L, "join"), (2L, "join"), (3L, "scan")))
  }

  test("positional index emits ascending 0-based positions") {
    val out = Ranking.positionalIndex(docs, "text", "doc_id")
      .select("word", "doc_id", "positions").as[(String, Long, String)].collect()
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("join", 1L)) == "1 5")
    assert(m(("hash", 1L)) == "0")
    assert(!m.keySet.exists(_._2 == 4L), "empty doc contributes nothing")
  }

  test("phrase join counts overlapping occurrences and crosses no docs") {
    val d = Seq(
      (1L, "a b a b a"), // 'a b' starts at 0 and 2
      (2L, "a a b"), // one occurrence
      (3L, "b a")).toDF("doc_id", "text") // none
    val out = Ranking.phraseCount(d, "text", "doc_id", Seq("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("three-term phrase requires full adjacency") {
    val d = Seq(
      (1L, "x y z tail"),
      (2L, "x y q z")).toDF("doc_id", "text")
    val out = Ranking.phraseCount(d, "text", "doc_id", Seq("x", "y", "z"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L))
  }

  test("hash split is deterministic, partition-invariant, and exhaustive") {
    val ids = (0L until 2000L).toDF("doc_id")
    val cuts = Seq("test" -> "1a", "val" -> "34")
    val s1 = Curation.hashSplit(ids, "doc_id", cuts, "train")
      .as[(Long, String)].collect().toMap
    val s2 = Curation.hashSplit(ids.repartition(7), "doc_id", cuts, "train")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2, "assignment must not depend on partitioning")
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    // 26/256 ≈ 10.2% per held-out split; generous tolerance on 2000 ids
    assert(math.abs(frac("test") - 0.102) < 0.03, s"test frac ${frac("test")}")
    assert(math.abs(frac("val") - 0.102) < 0.03, s"val frac ${frac("val")}")
    assert(frac("train") > 0.7)
  }

  test("mix sources realizes target weights, partition-invariant, epochs distinct") {
    val rows = (0L until 4000L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "source")
    val weights = Map("g0" -> 2.5, "g1" -> 0.25, "g2" -> 0.0)
    val m1 = Curation.mixSources(rows, "source", "doc_id", weights, default = 1.0)
      .as[(Long, String, Long)].collect().toSet
    val m2 = Curation.mixSources(rows.repartition(7), "source", "doc_id", weights, default = 1.0)
      .as[(Long, String, Long)].collect().toSet
    assert(m1 == m2, "mix must not depend on partitioning")
    val bySrc = m1.groupBy(_._2).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(bySrc("g0") - 2.5) < 0.15, s"g0 realized ${bySrc("g0")}")
    assert(math.abs(bySrc("g1") - 0.25) < 0.1, s"g1 realized ${bySrc("g1")}")
    assert(!bySrc.contains("g2"), "zero-weight group must vanish")
    assert(math.abs(bySrc("g3") - 1.0) < 1e-9, "default weight keeps every row once")
    // epoch column: contiguous 0..copies-1 per kept doc
    m1.groupBy(t => (t._1, t._2)).foreach { case ((id, _), copies) =>
      val epochs = copies.map(_._3)
      assert(epochs == (0L until epochs.size).toSet, s"doc $id epochs $epochs")
    }
    // every g0 doc appears at least twice (floor(2.5)); no doc more than thrice
    val g0counts = m1.filter(_._2 == "g0").groupBy(_._1).map(_._2.size).toSet
    assert(g0counts.subsetOf(Set(2, 3)))
  }

  test("sampleByRates realizes rates, nests across rates, keeps rate-1 groups exactly") {
    val rows = (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "lang")
    val kept = Curation.sampleByRates(
      rows, "lang", "doc_id", Map("g0" -> 0.3, "g1" -> 1.0))
      .as[(Long, String)].collect().toSet
    val keptShuffled = Curation.sampleByRates(
      rows.repartition(7), "lang", "doc_id", Map("g0" -> 0.3, "g1" -> 1.0))
      .as[(Long, String)].collect().toSet
    assert(kept == keptShuffled, "kept set must not depend on partitioning")
    val byG = kept.groupBy(_._2).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(byG("g0") - 0.3) < 0.07, s"g0 realized ${byG("g0")}")
    assert(byG("g1") == 1.0, "rate 1.0 must keep every row exactly")
    assert(byG("g2") == 1.0, "groups without a rate keep everything")
    // nesting: the 0.3 sample is a subset of the 0.6 sample of the same group
    val wider = Curation.sampleByRates(rows, "lang", "doc_id", Map("g0" -> 0.6))
      .as[(Long, String)].collect().toSet
    assert(kept.filter(_._2 == "g0").subsetOf(wider))
  }

  test("sequence packing is contiguous per bucket, offset-bounded, partition-invariant") {
    val rnd = new scala.util.Random(11)
    val d = (0L until 500L).map { i =>
      (i, (1 to 1 + rnd.nextInt(30)).map(_ => "tok").mkString(" "))
    }.toDF("doc_id", "text")
    val (seqLen, buckets) = (64, 4)
    val p1 = Curation.packSequences(d, "text", "doc_id", seqLen, buckets)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val p2 = Curation.packSequences(d.repartition(7), "text", "doc_id", seqLen, buckets)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(p1 == p2, "packing must not depend on partitioning")
    assert(p1.map(_._1) == (0L until 500L), "every document packs exactly once")
    p1.foreach { case (id, b, seq, off, n) =>
      assert(b >= 0 && b < buckets && seq >= 0 && off >= 0 && off < seqLen && n >= 1,
        s"doc $id: bucket $b seq $seq off $off n $n")
    }
    // contiguity: within a bucket, doc k+1 starts exactly where doc k ended
    p1.groupBy(_._2).foreach { case (b, ds) =>
      val inOrder = ds.sortBy(_._1)
      inOrder.zip(inOrder.tail).foreach { case ((_, _, s0, o0, n0), (id1, _, s1, o1, _)) =>
        val endTok = s0 * seqLen + o0 + n0
        assert(s1 * seqLen + o1 == endTok,
          s"bucket $b: doc $id1 starts at ${s1 * seqLen + o1}, expected $endTok")
      }
    }
    // null/empty text packs as a zero-length doc, not a null hole
    val withNull = Seq((1000L, null.asInstanceOf[String]), (1001L, ""), (1002L, "a b"))
      .toDF("doc_id", "text")
    val pn = Curation.packSequences(withNull, "text", "doc_id", seqLen, buckets)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(pn.map(_._1) == Seq(1000L, 1001L, 1002L))
    assert(pn.forall(r => r._3 == 0L && r._4 == 0L), s"zero-length docs pack at origin: $pn")
    assert(pn.map(_._5) == Seq(0L, 0L, 2L))
  }

  test("AlnumTokens edge cases: empty, whitespace-only, unicode, digits") {
    val d = Seq(
      (1L, ""), (2L, "   \t\n "), (3L, "héllo wörld"), (4L, "a1b2 3,4!"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Ranking.tokensWithPos(d, "text", "doc_id")
      .as[(Long, Int, String)].collect().sorted.toSeq
    // multi-byte chars are stripped byte-wise (ASCII-only alphabet, same
    // as the regex formulation on lowered text); empty/ws/null emit nothing
    assert(out == Seq((3L, 0, "hllo"), (3L, 1, "wrld"), (4L, 0, "a1b2"), (4L, 1, "34")))
  }

  test("native AlnumTokens matches the posexplode(wordsArr) formulation") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val native = Ranking.tokensWithPos(real, "text", "doc_id")
      .as[(Long, Int, String)].collect().sorted.toSeq
    val hof = real.select(
      col("doc_id"),
      posexplode(graft.functions.TextFunctions.wordsArr(col("text"))))
      .toDF("doc_id", "pos", "word")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(native == hof)
    assert(native.nonEmpty)
  }

  test("approx_percentile tracks the exact q58 percentiles") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p"))
      .as[(String, Double)].collect().toMap
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p"))
      .as[(String, Double)].collect().toMap
    exact.foreach { case (k, p) =>
      assert(math.abs(approx(k) - p) / p < 0.05, s"$k: approx ${approx(k)} vs $p")
    }
  }
}
