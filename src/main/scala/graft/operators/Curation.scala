package graft.operators

import org.apache.spark.sql.DataFrame
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
    val withFp = docs.withColumn("fp", md5(normText(col(textCol))))
    val keepers = withFp
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = withFp.join(keepers, Seq(idCol), "left_semi")
    TextAnalysis.documentProfile(deduped, textCol, idCol)
      .filter(col("quality_score") === 1 && col("pred_lang").isin(langs: _*))
      .select(col(idCol), col("n_words"), col("pred_lang"))
  }
}
