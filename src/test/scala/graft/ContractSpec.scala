package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the Verify/Bench/smoke plumbing assumes these
  * invariants; breaking one silently weakens a gate rather than failing
  * it, so they are pinned here.
  */
class ContractSpec extends AnyFunSuite with SparkTestBase {

  test("every oracle entry points at a registered query") {
    val dead = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"oracle SQL with no query: $dead")
  }

  test("the rows-only set is empty: every query carries a full oracle") {
    // round 15 closed the last gap: q7's HLL moved from Spark's
    // engine-internal approx_count_distinct to md5-derived registers
    // (the q93/q113 sketch discipline), so the estimate itself is
    // DuckDB-replayable — zero rows-only entries remain
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set.empty[String],
      s"every deterministic query must carry an oracle; rows-only = $rowsOnly")
  }

  test("entry() produces rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique across packs (no silent map overwrites)") {
    val packs = Seq(
      graft.queries.ReferenceQueries.queries, graft.queries.RelationalQueries.queries,
      graft.queries.TextQueries.queries, graft.queries.DedupQueries.queries,
      graft.queries.SimilarityQueries.queries, graft.queries.MultimodalQueries.queries,
      graft.queries.SearchQueries.queries, graft.queries.IndexParityQueries.queries,
      graft.queries.HygieneQueries.queries, graft.queries.StreamParityQueries.queries)
    val all = packs.flatMap(_.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names across packs: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }
}
