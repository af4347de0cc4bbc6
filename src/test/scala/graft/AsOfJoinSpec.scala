package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("picks the latest right row at or before the left time, per key") {
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 20L, "t2"), ("B", 15L, "t3"))
      .toDF("sym", "t", "trade")
    val quotes = Seq(
      ("A", 5L, 100.0), ("A", 10L, 101.0), ("A", 19L, 102.0),
      ("B", 16L, 200.0))
      .toDF("sym", "qt", "px")
    val got = AsOfJoin(trades, quotes, "sym", "t", "qt", Seq("px"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    // t1 at t=10: quote at exactly 10 is visible (<= semantics)
    assert(got("t1").contains(101.0))
    // t2 at t=20: latest is the t=19 quote
    assert(got("t2").contains(102.0))
    // t3 at t=15: B's only quote is at 16 → no match
    assert(got("t3").isEmpty)
  }

  test("matches a brute-force reference on random series") {
    val rnd = new scala.util.Random(99)
    val left = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong))
    val right = (1 to 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i * 10.0))
      // dedupe (key, time) so the as-of pick is well-defined
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val l = left.toDF("k", "t", "lid")
    val r = right.toDF("k", "qt", "px")
    val got = AsOfJoin(l, r, "k", "t", "qt", Seq("px"))
      .select("lid", "asof_px").as[(Long, Option[Double])].collect().toMap
    left.foreach { case (k, t, lid) =>
      val expected = right.filter(x => x._1 == k && x._2 <= t)
        .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      assert(got(lid) == expected, s"key=$k t=$t lid=$lid")
    }
  }
}
