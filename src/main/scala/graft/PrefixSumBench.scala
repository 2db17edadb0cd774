package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.functions._

/** A/B evidence for the distributed prefix-sum claim (q99's primitive):
  * DistributedRank.withGlobalPrefixSum vs the naive partition-less
  * `sum().over(Window.orderBy(...))`, which funnels the ENTIRE input
  * through one task's sort. Both variants compute the same inclusive
  * cumulative sum over a total order; both are forced end-to-end with a
  * noop write and cross-checked on max(cum) == the closed-form total.
  * Usage: PrefixSumBench [rows]; prints one line per variant + a JSON
  * summary. Results recorded in SCALE.md §7b.
  */
object PrefixSumBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100_000_000L
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", "prefix-bench")
    import org.apache.spark.sql.expressions.Window
    // size range partitions so each one's local-running-sum buffer fits
    // execution memory alongside the pinned checkpoint blocks (the same
    // spill-aware partition sizing SCALE.md prescribes: at 32 partitions
    // a 1e8-row input puts ~3M buffered rows in EVERY concurrent window
    // task and starves the unified memory pool)
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_PREFIX_PARTS", "256"))

    // deterministic weights 0..999; total is checked against an exact
    // second aggregate, so a wrong prefix path can't time a wrong answer
    val fact = spark.range(rows)
      .select(col("id"), ((col("id") * 2654435761L) % 1000L).as("w"))
    val trueTotal = fact.agg(sum(col("w")).cast("long")).head().getLong(0)

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      var best = Double.MaxValue
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val got = mk.agg(max(col("cum")).cast("long")).head().getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        require(got == trueTotal, s"$label: max(cum)=$got != total=$trueTotal")
        println(f"$label rep$rep $sec%.2fs")
        best = math.min(best, sec)
      }
      best
    }

    val dense = time("dense_prefix_sum") {
      DistributedRank.withGlobalPrefixSumDense(
        fact, col("id"), col("w"), "cum", "total")
    }
    val dist = time("rangesampled_prefix_sum") {
      DistributedRank.withGlobalPrefixSum(
        fact, Seq(col("id")), col("w"), "cum", "total")
    }
    val naive = time("partitionless_window") {
      fact.withColumn("cum",
        sum(col("w")).over(Window.orderBy(col("id"))).cast("long"))
    }
    println(s"""{"metric":"prefix_sum_bench","rows":$rows,""" +
      s""""dense_sec":$dense,"rangesampled_sec":$dist,"window_sec":$naive}""")
    spark.stop()
  }
}
