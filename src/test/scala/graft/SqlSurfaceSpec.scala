package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-API parity: the engine is DataFrame-first, but the same tables and
  * functions must work through `spark.sql` (temp views + the registered
  * native function) with identical results.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("spark.sql over temp views matches the DataFrame pipeline") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
    val sqlResult = spark.sql(
      """SELECT word, count(DISTINCT doc_id) AS df
        |FROM (
        |  SELECT doc_id, ascii_clean_lower(tok) AS word
        |  FROM (SELECT doc_id, explode(split(text, '\\s+')) AS tok FROM documents))
        |WHERE length(word) > 0
        |GROUP BY word""".stripMargin)
      .as[(String, Long)].collect().toMap
    val dfResult = graft.queries.ReferenceQueries.q3DocFrequency(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(sqlResult == dfResult)
  }

  test("LSH embedding near-dup pairs are a subset of the exact pairs") {
    val exact = graft.queries.SimilarityQueries.q34EmbedPairs(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = graft.queries.SimilarityQueries.q35EmbedDupLsh(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH candidates must never invent pairs")
  }
}
