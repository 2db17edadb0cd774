package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — row_number over a TOTAL order
  * without ever sorting the dataset on one partition.
  *
  * A partition-less `row_number().over(Window.orderBy(...))` (or
  * `ntile`) moves the ENTIRE input through a single task — correct at
  * small SF, single-threaded and OOM-bound at 100 TB. This helper is
  * the scale shape of the same operator:
  *
  *   1. `repartitionByRange(ord)` — ONE shuffle; the range sampler
  *      keeps partitions balanced, and partition i holds rows that all
  *      precede partition i+1 in the total order.
  *   2. `sortWithinPartitions(ord)` + `monotonically_increasing_id()`
  *      — every partition sorts only its own slice, in parallel, and
  *      the id encodes (partition, 0-based local rank) as
  *      `pid << 33 | localRank` (public contract of
  *      monotonically_increasing_id), so local ranks fall out scan-side
  *      with no window and no second shuffle of the data.
  *   3. Per-partition counts (|partitions| rows) -> prefix offsets via
  *      a tiny triangular self-join — no partition-less window, no
  *      driver collect.
  *   4. global rank = prefix offset + local rank, joined back with a
  *      broadcast of the |partitions|-row offset table.
  *
  * The two consumers of the range shuffle (the ranked rows and the
  * per-partition counts) canonicalize to the same exchange, so Spark's
  * ReuseExchange/AQE stage reuse executes it once; even when
  * recomputed, the range sampler is seeded deterministically per input
  * partition, so partition assignment is stable across executions.
  *
  * Requirement: `ord` must be a TOTAL order (include a unique
  * tiebreaker column) — otherwise ranks of tied rows depend on the
  * physical row order.
  */
object DistributedRank {

  /** `df` plus `rankCol` (1-based global row_number over `ord`) and
    * `totalCol` (the total row count, same on every row — the usual
    * companion for rank-based binning/percentile math). */
  def withGlobalRank(df: DataFrame, ord: Seq[Column],
      rankCol: String, totalCol: String): DataFrame = {
    val npart = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df
      .repartitionByRange(npart, ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .withColumn("__lr", (col("__mid").bitwiseAND((1L << 33) - 1) + 1L))
      .drop("__mid")
    val cnts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
    // prefix sum over <= npart rows: triangular left-join instead of a
    // partition-less window, so no WindowExec anywhere in the plan
    val offs = cnts.as("a")
      .join(cnts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    val total = cnts.agg(sum(col("__n")).cast("long").as(totalCol))
    local
      .join(broadcast(offs), "__pid")
      .crossJoin(broadcast(total))
      .withColumn(rankCol, col("__off") + col("__lr"))
      .drop("__pid", "__lr", "__off")
  }
}
