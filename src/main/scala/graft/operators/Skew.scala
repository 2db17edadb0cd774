package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §7 "hard parts": bot IPs carry
  * ~10x traffic and are exactly the keys A1 groups by).
  *
  * AQE's skew-join splitting covers most cases at runtime; these are the
  * explicit fallbacks for when the plan must be skew-proof by
  * construction:
  *
  *   - saltedAggregate: two-phase aggregation through a random salt —
  *     phase 1 spreads one hot key over `salts` reducers, phase 2
  *     merges the per-salt partials. For algebraic aggregates
  *     (count/sum/min/max) the result is exact.
  *   - saltedJoin: replicate the small side `salts` times, salt the big
  *     side randomly — every hot-key partition shrinks by `salts`.
  */
object Skew {

  /** Exact two-phase count per key through a salt. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n"))

  /** Broadcast-free equi-join where `big`'s key distribution is skewed:
    * salt the big side, replicate the small side across all salts. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
