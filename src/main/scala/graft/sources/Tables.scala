package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink facade — the engine's IO surface beyond the reference's
  * plain-text scan (SURVEY §2.2 "scans/sources/sinks"): parquet, ORC,
  * CSV, JSON, and text, with explicit-schema reads (schema inference is
  * a full extra pass at 100 TB — always pass the schema in production)
  * and partitioned columnar writes.
  */
object Tables {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with explicit schema and header. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** JSON-lines with explicit schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** ORC — Spark's other built-in columnar format (predicate pushdown and
    * column pruning like parquet).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Partitioned parquet write — the standard large-output layout:
    * `partitionBy` gives partition pruning to downstream readers.
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Column profile — the `ANALYZE TABLE`-style statistics pass every
    * engine exposes: one row per profiled column with row count, null
    * count, exact distinct count, and (for numeric columns) min/max
    * widened to double (non-numeric min/max stay null — emitting them
    * as strings would tie the output to engine-specific rendering of
    * dates/floats). ONE scan computes every statistic: the aggregates
    * land in a single row that a final one-row projection explodes to
    * long format — no per-column re-scan.
    *
    * Scale note: multiple exact `countDistinct`s in one aggregation
    * plan through Catalyst's Expand (one duplicated stream per distinct
    * column). Exact is right at fixture scale (and for the oracle); at
    * 100 TB swap `approx_count_distinct` (HLL, mergeable, no Expand) —
    * spec-asserted within 5% of exact, the q58/q7 trade.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.NumericType
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    def numeric(c: String) =
      df.schema(df.schema.fieldIndex(c)).dataType.isInstanceOf[NumericType]
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        (if (numeric(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mn_$c"),
        (if (numeric(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(
          lit(c).as("column"),
          col("n_rows"),
          (col("n_rows") - col(s"__nn_$c")).as("n_null"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__mn_$c").as("min_num"),
          col(s"__mx_$c").as("max_num"))
      }: _*)).as("p"))
      .select("p.*")
  }
}
