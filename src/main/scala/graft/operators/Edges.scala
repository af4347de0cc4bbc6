package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared graph-edge builders for the co-purchase analytics family
  * (triangle count q150, label propagation q199, BFS hops q203). One
  * definition, one plan — the three queries previously each authored
  * the identical support-2 edge derivation inline.
  *
  * The build is basket-local: group lineitem to per-order part sets
  * (ONE map-side-combinable `collect_set` exchange — the set state is
  * bounded by basket size, not corpus size), emit the a<b pairs of each
  * basket with an in-basket generator (narrow), and count pair support
  * with a second hash aggregation. Two exchanges total; the previous
  * distinct + self-join formulation paid four (distinct, both join
  * sides, pair count) and shuffled the pair fan-out twice. Basket-size
  * skew bounds the generator: a basket of s parts emits C(s,2) pairs
  * in-place, never through a join.
  *
  * DETERMINISM: pair emission and support counting are exact integer
  * set operations; orientation is a<b on part ids.
  */
object Edges {

  /** Directed (a < b) co-purchase edges over parts appearing together in
    * at least `minSupport` distinct orders. Schema: (a: long, b: long).
    */
  def coPurchase(spark: SparkSession, dir: String, minSupport: Long = 2L): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val baskets = li.groupBy("ok")
      .agg(array_sort(collect_set(col("pk"))).as("parts"))
    baskets
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts) - i - 1), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minSupport)
      .select(col("a"), col("b"))
  }

  /** [[coPurchase]] symmetrized to both directions — the undirected
    * adjacency view the propagation queries (q199, q203) join against.
    * Callers persist; the query runner owns the cache lifecycle.
    */
  def coPurchaseUndirected(spark: SparkSession, dir: String, minSupport: Long = 2L): DataFrame = {
    val e = coPurchase(spark, dir, minSupport)
    e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
  }
}
