package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join strategy for fact⋈fact
  * joins that cannot broadcast (SURVEY.md §4 shuffle plan).
  *
  * Writing both sides bucketed+sorted by the join key means the join
  * compiles to a zero-Exchange SortMergeJoin: each task reads matching
  * bucket files from both tables. At 100 TB this converts the single
  * biggest shuffle in the pipeline (events ⋈ events-derived state, or
  * events ⋈ large dim) into a scan-local merge.
  *
  * Spark only honors bucket metadata through the catalog, hence
  * saveAsTable rather than a path write.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts the plan has no Exchange on either side. */
  def bucketedJoin(s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), key)

  /** True when the executed plan contains no SHUFFLE exchange — the
    * property bucketing exists to guarantee. Checked structurally: a
    * string match on "Exchange" would also hit BroadcastExchange /
    * ReusedExchange, mis-reporting genuinely shuffle-free broadcast
    * plans, and is fragile under AQE's plan rendering. */
  def hasNoShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case e: ShuffleExchangeLike => e
      case a: AdaptiveSparkPlanExec if shuffles(a.executedPlan).nonEmpty => a
    }
    shuffles(df.queryExecution.executedPlan).isEmpty
  }
}
