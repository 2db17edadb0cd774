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

  /** Round-robin salt: monotonically_increasing_id embeds the partition
    * id in its high bits and a per-partition counter in the low 33, so
    * pmod over it spreads rows of one key evenly across `salts`. One
    * definition — both utilities must salt identically to be reasoned
    * about together. */
  private def saltCol(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts))

  /** JVM mirror of q270's `recommended_salt` audit column (ScaleOps) —
    * the ONE derivation both ends of the loop share, so a pipeline can
    * read the pre-flight's number and hand it straight to
    * [[saltedCount]]/[[saltedJoin]]: ceil(maxKeyRows / p50KeyRows),
    * clamped to [1, 256], rounded UP to a power of two. The heaviest
    * key's reducer load shrinks by the salt factor, so salting at this
    * value brings it to roughly a median key's weight; the power-of-two
    * rounding keeps salt counts composable with partition counts; the
    * 256 cap bounds the small-side replication cost saltedJoin pays.
    * 1 means "don't salt". */
  def recommendedSalt(maxKeyRows: Long, p50KeyRows: Long): Int = {
    require(p50KeyRows > 0, s"p50KeyRows must be positive, got $p50KeyRows")
    val r = math.min(math.max((maxKeyRows + p50KeyRows - 1) / p50KeyRows, 1L), 256L)
    if (r <= 1L) 1
    else 1 << (64 - java.lang.Long.numberOfLeadingZeros(r - 1L))
  }

  /** Exact two-phase count per key through a salt. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n"))

  /** Broadcast-free equi-join where `big`'s key distribution is skewed:
    * salt the big side, replicate the small side across all salts. The
    * shuffle_hash hint pins the shuffled-hash strategy — if the
    * replicated side auto-broadcast, no shuffle would exist and the
    * salt would be a silent no-op instead of the guaranteed 1/salts
    * reducer-load cut this operator is chosen for. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(salts))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }
}
