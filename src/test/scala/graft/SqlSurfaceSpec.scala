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

  test("SQL pipe syntax composes the registered functions (Spark 4 surface)") {
    // the |> operator chain must produce the identical doc-frequency
    // table as the nested-subquery formulation and the DataFrame path —
    // pipe syntax is sugar over the same plan, not a second engine
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
    val piped = spark.sql(
      """FROM documents
        ||> SELECT doc_id, explode(split(text, '\\s+')) AS tok
        ||> SELECT doc_id, ascii_clean_lower(tok) AS word
        ||> WHERE length(word) > 0
        ||> AGGREGATE count(DISTINCT doc_id) AS df GROUP BY word""".stripMargin)
      .as[(String, Long)].collect().toMap
    val dfResult = graft.queries.ReferenceQueries.q3DocFrequency(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(piped == dfResult, "pipe-syntax plan diverged from the DataFrame path")
  }

  test("registered generators and vector_dot work through spark.sql") {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("documents")
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("embeddings")

    // alnum_tokens generator: positional tokens match the operator path
    val sqlToks = spark.sql(
      """SELECT doc_id, pos, word
        |FROM documents LATERAL VIEW alnum_tokens(text) t AS pos, word""".stripMargin)
      .as[(Long, Int, String)].collect().sorted.toSeq
    val opToks = graft.operators.Ranking.tokensWithPos(
      spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id")
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(sqlToks == opToks && sqlToks.nonEmpty)

    // word_ngrams + winnow generators parse and emit; occurrence mode
    // (distinct => false) must emit at least as many rows as shingle mode
    val nDistinct = spark.sql(
      """SELECT count(*) FROM documents
        |LATERAL VIEW word_ngrams(text, 3) s AS sh""".stripMargin)
      .as[Long].head()
    val nOccur = spark.sql(
      """SELECT count(*) FROM documents
        |LATERAL VIEW word_ngrams(text, 3, false) s AS sh""".stripMargin)
      .as[Long].head()
    assert(nDistinct > 0 && nOccur >= nDistinct)
    assert(spark.sql(
      """SELECT count(*) FROM documents
        |LATERAL VIEW winnow(text, 5, 4) f AS fp""".stripMargin)
      .as[Long].head() > 0)

    // token_chunks generator: chunk rows parse and cover the corpus
    assert(spark.sql(
      """SELECT count(*) FROM documents
        |LATERAL VIEW token_chunks(text, 40, 25) c
        |  AS chunk_id, start_tok, n_tok, chunk_fp""".stripMargin)
      .as[Long].head() > 0)

    // quantize_int8: struct fields resolve; saturation always present on
    // a non-zero vector (its max component quantizes to +/-127)
    assert(spark.sql(
      """SELECT quantize_int8(CAST(embedding AS ARRAY<DOUBLE>)).n_sat
        |FROM embeddings ORDER BY vec_id LIMIT 10""".stripMargin)
      .as[Int].collect().forall(_ >= 1))

    // vector_dot: self dot product is the squared L2 norm, positive
    val dots = spark.sql(
      """SELECT vec_id,
        |       vector_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                  CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM embeddings LIMIT 10""".stripMargin).as[(Long, Double)].collect()
    assert(dots.length == 10 && dots.forall(_._2 > 0))
  }

  test("LSH embedding near-dup pairs are a subset of the exact pairs") {
    val exact = graft.queries.SimilarityQueries.q34EmbedPairs(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = graft.queries.SimilarityQueries.q35EmbedDupLsh(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH candidates must never invent pairs")
  }
}
