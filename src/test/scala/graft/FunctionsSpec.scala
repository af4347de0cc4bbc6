package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AsciiCleanLower, CompressedPostingsAgg, PostingsCodec}

class FunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("ascii_clean_lower matches the regex formulation on random strings") {
    val rnd = new Random(42)
    val samples = (1 to 200).map { _ =>
      (1 to rnd.nextInt(30)).map(_ => rnd.nextInt(0x3000).toChar).mkString
    } :+ "" :+ "don't Mr. x1y“curly”"
    val df = samples.toDF("t")
    val rows = df.select(
      AsciiCleanLower(col("t")).as("native"),
      lower(regexp_replace(col("t"), "[^A-Za-z]", "")).as("regex"))
      .as[(String, String)].collect()
    rows.zip(samples).foreach { case ((native, regex), in) =>
      assert(native == regex, s"input: ${in.map(_.toInt).mkString(",")}")
    }
  }

  test("ascii_clean_lower reference semantics: join survivors, strip non-ASCII") {
    val got = Seq("don't", "Mr.", "x1y", "“curly”", "abc", "123", "")
      .toDF("t").select(AsciiCleanLower(col("t"))).as[String].collect().toSeq
    assert(got == Seq("dont", "mr", "xy", "curly", "abc", "", ""))
  }

  test("ascii_clean_lower is SQL-registered via GraftFunctions") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT ascii_clean_lower('Hello, Wörld!') AS w")
      .as[String].collect().head
    assert(got == "hellowrld")
  }

  test("postings codec round-trips and compresses") {
    val rnd = new Random(7)
    (1 to 100).foreach { _ =>
      val ids = (1 to rnd.nextInt(200))
        .map(_ => math.abs(rnd.nextLong()) % (1L << 40))
        .distinct.sorted.toArray
      val enc = PostingsCodec.encode(ids)
      assert(PostingsCodec.decode(enc).toSeq == ids.toSeq)
    }
    // dense postings compress far below 8 bytes/id
    val dense = (1000000L to 1010000L).toArray
    assert(PostingsCodec.encode(dense).length < dense.length * 2 + 10)
  }

  test("compressed postings aggregator equals collect_set") {
    val pairs = Seq((1L, "a"), (2L, "a"), (2L, "a"), (5L, "a"), (3L, "b"))
      .toDF("doc_id", "word")
    val agg = udaf(CompressedPostingsAgg)
    val got = pairs.groupBy("word")
      .agg(agg(col("doc_id")).as("post"))
      .as[(String, Array[Byte])].collect()
      .map { case (w, b) => w -> PostingsCodec.decode(b).toSeq }.toMap
    assert(got == Map("a" -> Seq(1L, 2L, 5L), "b" -> Seq(3L)))
  }

  test("alnum_word_count matches the generator and the HOF tokenizer on ASCII") {
    import graft.functions.{AlnumWordCount, TextFunctions}
    val rnd = new Random(21)
    // ASCII-only samples: the byte-wise and regex tokenizers agree by
    // contract on all ASCII input (divergence is limited to the two
    // exotic Unicode lowercase mappings documented on shinglePairs)
    val samples = ((1 to 200).map { _ =>
      (1 to rnd.nextInt(60)).map(_ => rnd.nextInt(0x80).toChar).mkString
    } :+ "" :+ " don't  Mr.\tx1y 123 ABC  " :+ "!!! ??? ...").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val rows = samples.toDF("id", "text")
      .select(
        AlnumWordCount(col("text")).as("native"),
        size(TextFunctions.wordsArr(col("text"))).as("hof"))
      .as[(Int, Int)].collect()
    rows.zip(samples).foreach { case ((native, hof), (_, in)) =>
      assert(native == hof, s"input: ${in.map(_.toInt).mkString(",")}")
    }
  }

  test("token_chunks matches the composed slice+md5 formulation and covers every word") {
    import graft.functions.{TokenChunks, TextFunctions}
    val (cs, stride) = (7, 4)
    val rnd = new Random(33)
    val samples = ((1 to 150).map { _ =>
      (1 to rnd.nextInt(40)).map(_ =>
        if (rnd.nextBoolean()) ('a' + rnd.nextInt(26)).toChar else ' ').mkString
    } :+ "" :+ "   " :+ "one" :+ "a b c d e f g h i j k l m")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = samples.toDF("doc_id", "text")
    val native = d
      .select(col("doc_id"), TokenChunks(col("text"), cs, stride))
      .as[(Long, Int, Int, Int, String)].collect().sorted.toSeq
    // composed twin: explode chunk ids, slice the words array, md5 the join
    val w = TextFunctions.wordsArr(col("text"))
    val composed = d
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0),
          floor((size(col("w")) - 1) / stride).cast("int"))).as("c"))
      .select(col("doc_id"), col("c"), (col("c") * stride).as("start"),
        least(lit(cs), size(col("w")) - col("c") * stride).as("n"),
        md5(concat_ws(" ", slice(col("w"), col("c") * stride + 1, lit(cs)))).as("fp"))
      .as[(Long, Int, Int, Int, String)].collect().sorted.toSeq
    assert(native == composed)
    // coverage: with stride <= size every word index falls in >= 1 chunk
    native.groupBy(_._1).foreach { case (id, chunks) =>
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet
      val total = samples(id.toInt)._2.split("\\s+").count(_.exists(_.isLetterOrDigit))
      assert(covered == (0 until total).toSet, s"doc $id: $covered vs $total words")
    }
  }

  test("quantize_int8 matches the HOF formulation; error bounded by scale/2") {
    import graft.functions.QuantizeInt8
    val rnd = new Random(44)
    val vecs = ((1 to 200).map { _ =>
      Array.fill(16)((rnd.nextDouble() - 0.5) * 4.0)
    } :+ Array.fill(16)(0.0) :+ Array(1.0, -1.0, 0.5, -0.25))
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    val d = vecs.toDF("id", "v")
    val native = d.select(col("id"), QuantizeInt8(col("v")).as("q"))
      .select(col("id"), col("q.scale"), col("q.q_sum"), col("q.n_sat"), col("q.max_abs_err"))
      .as[(Long, Double, Long, Int, Double)].collect().sortBy(_._1).toSeq
    val amax = array_max(transform(col("v"), abs(_)))
    val sc = amax / 127.0
    val qArr = transform(col("v"), x => floor(x / sc + lit(0.5)).cast("long"))
    val hof = d.select(
      col("id"),
      when(amax === 0.0, 0.0).otherwise(sc).as("scale"),
      when(amax === 0.0, 0L)
        .otherwise(aggregate(qArr, lit(0L), _ + _)).as("q_sum"),
      when(amax === 0.0, 0)
        .otherwise(size(filter(qArr, q => abs(q) === 127L))).as("n_sat"),
      when(amax === 0.0, 0.0)
        .otherwise(array_max(zip_with(qArr, col("v"),
          (q, x) => abs(q.cast("double") * sc - x)))).as("err"))
      .as[(Long, Double, Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(native == hof)
    native.foreach { case (id, scale, _, _, err) =>
      assert(err <= scale / 2 + 1e-12, s"vec $id err $err > scale/2 ${scale / 2}")
    }
    val zero = native.find(_._1 == 200L).get
    assert(zero == ((200L, 0.0, 0L, 0, 0.0)), "all-zero vector quantizes to zeros")
  }

  test("postings aggregation state stays O(compressed) on a million-posting word") {
    // a stop-word-scale group: 1M distinct IDs arriving UNSORTED (worst
    // case for the staging tail), split across two partial buffers that
    // are then merged — the full partial-agg + shuffle-merge lifecycle
    val n = 1000000
    val rnd = new Random(99)
    val ids = rnd.shuffle((0 until n).toVector).map(_.toLong)
    val (left, right) = ids.splitAt(n / 2)
    var b1 = CompressedPostingsAgg.zero
    var peak = 0L
    left.foreach { id =>
      b1 = CompressedPostingsAgg.reduce(b1, id)
      if ((id & 0xfff) == 0) peak = math.max(peak, b1.stateBytes)
    }
    var b2 = CompressedPostingsAgg.zero
    right.foreach { id => b2 = CompressedPostingsAgg.reduce(b2, id) }
    peak = math.max(peak, b1.stateBytes + b2.stateBytes)
    val merged = CompressedPostingsAgg.merge(b1, b2)
    peak = math.max(peak, merged.stateBytes)
    val out = CompressedPostingsAgg.finish(merged)
    // correctness: exactly the sorted distinct set, dense deltas
    assert(PostingsCodec.decode(out).toSeq == (0L until n.toLong))
    // boundedness: collect_set state is >= 8 bytes/ID (16 MB boxed-set
    // reality is far higher); the compressed ladder must stay well under
    // half that — in practice ~2-3 bytes/ID for shuffled dense IDs
    assert(peak < 4L * n, s"peak state $peak bytes >= ${4L * n}")
    assert(out.length < 2 * n, s"final encoding ${out.length} bytes")
  }

  test("postings run ladder is strictly growing after every merge") {
    // Property check for the documented log-structured invariant: after
    // absorb, run sizes must STRICTLY grow from head at every depth —
    // round 5's one-shot compact() left equal-size runs deeper in the
    // ladder (e.g. sizes [3,5,5,9]) unmerged. Random partial-buffer sizes
    // and merge orders exercise exactly those equal-size collisions.
    val rnd = new Random(7)
    val partials = (0 until 24).map { p =>
      var b = CompressedPostingsAgg.zero
      val count = 1 + rnd.nextInt(6000)
      (0 until count).foreach { _ =>
        b = CompressedPostingsAgg.reduce(b, rnd.nextInt(100000).toLong)
      }
      b
    }
    val merged = rnd.shuffle(partials).reduceLeft { (a, b) =>
      val m = CompressedPostingsAgg.merge(a, b)
      val sizes = m.runs.map(_.length)
      assert(sizes == sizes.sorted && sizes.distinct == sizes,
        s"ladder not strictly growing: $sizes")
      m
    }
    val out = PostingsCodec.decode(CompressedPostingsAgg.finish(merged)).toSeq
    assert(out == out.sorted && out.distinct == out)
  }

  test("WordNgrams occurrence mode emits every n-gram in order, no short-doc fallback") {
    val df = Seq((1L, "a B a b"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val occ = df.select(col("doc_id"),
        graft.functions.WordNgrams(col("text"), 2, distinct = false).as("bg"))
      .as[(Long, String)].collect().toSeq
    assert(occ == Seq((1L, "a b"), (1L, "b a"), (1L, "a b")))
    // default distinct mode is unchanged: dedup + whole-doc fallback
    val dis = df.select(col("doc_id"),
        graft.functions.WordNgrams(col("text"), 2).as("sh"))
      .as[(Long, String)].collect().toSeq
    assert(dis == Seq((1L, "a b"), (1L, "b a"), (2L, "solo"), (3L, "")))
  }

  test("zorder key interleaves bits exactly and orders monotonically per dimension") {
    import graft.functions.ZOrderKey.interleave
    // bit-by-bit reference implementation
    def ref(a: Long, b: Long): Long =
      (0 until 32).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new Random(21)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() & 0x7fffffffL
      val b = rnd.nextLong() & 0x7fffffffL
      assert(interleave(a, b) == ref(a, b), s"($a, $b)")
      // fixing one dimension, the key is strictly monotone in the other
      if (a > 0) assert(interleave(a - 1, b) < interleave(a, b))
      if (b > 0) assert(interleave(a, b - 1) < interleave(a, b))
    }
    // documented masking: only the low 32 bits of each input participate
    assert(interleave(1L << 40 | 5L, 0L) == interleave(5L, 0L))
  }

  test("native Tokenize generator matches the composed built-ins") {
    val rnd = new Random(13)
    val samples = ((1 to 100).map { _ =>
      (1 to rnd.nextInt(60)).map(_ => rnd.nextInt(0x300).toChar).mkString
    } :+ "" :+ " don't  Mr.\tx1y “curly” 123 ABC  ").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    val native = graft.operators.Tokenizer.tokens(df, "text", Seq("doc_id"))
      .as[(Long, String)].collect().toSeq.sorted
    val composed = graft.operators.Tokenizer.tokensComposed(df, "text", Seq("doc_id"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(native == composed)
  }

  test("SimplifyAsciiCleanLower removes redundant applications") {
    import graft.plans.SimplifyAsciiCleanLower
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ SimplifyAsciiCleanLower
    try {
      val df = spark.read.parquet(s"$sfDir/documents.parquet").limit(5)
        .select(AsciiCleanLower(lower(AsciiCleanLower(col("text")))).as("w"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert("ascii_clean_lower".r.findAllIn(optimized).size == 1, optimized)
      assert("(?<!_)lower\\(".r.findFirstIn(optimized).isEmpty, optimized)
      val direct = spark.read.parquet(s"$sfDir/documents.parquet").limit(5)
        .select(AsciiCleanLower(col("text")).as("w"))
      assert(df.as[String].collect().toSeq == direct.as[String].collect().toSeq)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("winnowing fingerprints: shared substrings share fingerprints") {
    import graft.functions.Winnow
    val k = 5; val w = 4
    def fp(s: String): Set[Long] =
      Winnow.fingerprints(s.getBytes("UTF-8"), k, w).toSet
    val core = "the quick brown fox jumps over the lazy dog repeatedly"
    val a = fp("PREFIX AAA " + core + " SUFFIX one")
    val b = fp("other start " + core + " different end")
    // winnowing guarantee: a shared substring of length >= w + k - 1
    // yields at least one shared fingerprint
    assert(a.intersect(b).nonEmpty)
    assert(fp(core) == fp("  " + core.toUpperCase + "!!"), "normalization-invariant")
    assert(fp("abc") == fp("abc"), "tiny docs still fingerprint")
    assert(fp("") .isEmpty)
    // disjoint content should (overwhelmingly) not collide
    assert(fp("completely unrelated words here")
      .intersect(fp("zzz qqq xxx vvv uuu")).isEmpty)
  }

  test("winnow generator emits distinct fingerprints per document") {
    import graft.functions.Winnow
    val df = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
      .select(col("doc_id"), Winnow(col("text"), 5, 4).as("fp"))
    val rows = df.as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.values.foreach(v => assert(v.distinct.length == v.length))
  }
}
