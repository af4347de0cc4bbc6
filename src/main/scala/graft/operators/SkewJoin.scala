package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4.3): when one join key
  * carries a disproportionate share of the big side (the reference's
  * letter buckets are the in-house example — `s` huge, `z` empty), a
  * plain shuffle join sends the whole hot key to one task. Salting
  * splits each hot key into `saltFactor` sub-keys:
  *
  *   - big side: `salt = monotonically_increasing_id % saltFactor`
  *     (uniform, join-semantics-neutral);
  *   - small side: exploded over all salt values (×saltFactor rows —
  *     fine for dimension-sized inputs);
  *   - join on (key, salt) → hot keys now span saltFactor tasks.
  *
  * AQE's skew-join handles many cases automatically; explicit salting
  * remains the tool when a single key exceeds what split-and-replicate
  * can fix (e.g. joins feeding aggregations where AQE cannot split).
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor)))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
