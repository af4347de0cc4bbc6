package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4.2 hash
  * partitioning, taken to its cluster conclusion): writing both fact
  * tables bucketed AND sorted by the join key lets Spark plan the join
  * with ZERO exchanges — each task reads matching buckets from both
  * sides and merge-joins them in place. At 100 TB this turns the one
  * remaining big-big shuffle (e.g. lineitem⋈orders) into a scan-only
  * stage; the shuffle cost is paid once at write time and amortized over
  * every subsequent join.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table registered in the
    * session catalog.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog;
    * plain `spark.read.parquet` on the same files would lose it).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
