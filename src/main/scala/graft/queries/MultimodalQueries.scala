package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalPipeline

/** Multimodal query pack (q60-q61): the binary-payload pipeline run over
  * the `documents` fixture. The decode step is a deterministic stub
  * (md5-derived features — see MultimodalPipeline.FakeDecoder), which is
  * exactly what makes these oracle-checkable: DuckDB recomputes the same
  * closed form from the text bytes.
  */
object MultimodalQueries {

  /** q60: per-(modality, f0-bucket) histogram of extracted features. */
  def q60FeatureSummary(spark: SparkSession, dir: String): DataFrame =
    MultimodalPipeline.featureSummary(
      MultimodalPipeline.extractFeatures(
        MultimodalPipeline.ingestFromDocuments(spark, dir)))

  /** q61: frames per video item at 1-second sampling. */
  def q61FrameCounts(spark: SparkSession, dir: String): DataFrame =
    MultimodalPipeline.sampleFrames(
      MultimodalPipeline.ingestFromDocuments(spark, dir), everyMs = 1000L)
      .groupBy("id")
      .agg(count(lit(1)).as("n_frames"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_feature_summary" -> (q60FeatureSummary _),
    "q61_frame_counts" -> (q61FrameCounts _))

  val oracleSql: Map[String, String] = Map(
    // payload = UTF-8 bytes of text → md5(payload) == md5(text);
    // f0 = float32(uint32(md5[0:8]) / 2^32); bucket = floor(f0 * 16)
    "q60_feature_summary" ->
      """SELECT
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(floor(CAST(CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS DOUBLE)
        |             / 4294967296.0 AS FLOAT) * 16) AS INT) AS f0_bucket,
        |  count(*) AS n_items
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q61_frame_counts" ->
      """SELECT doc_id AS id, (n_chars * 10) // 1000 + 1 AS n_frames
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin)
}
