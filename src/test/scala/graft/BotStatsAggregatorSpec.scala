package graft

import graft.operators.{BotStatsAggregator, ViewsPipeline}
import graft.sources.DataGen
import org.apache.spark.sql.functions._

class BotStatsAggregatorSpec extends SparkSpec {

  test("single-pass fused aggregator flags the same users as the two-pass reference path") {
    import spark.implicits._
    val users = DataGen.users(30, seed = 11L)
    val items = DataGen.items(50)
    val hourStart = 1700000000L - (1700000000L % 3600)
    val cleaned = ViewsPipeline.clean(DataGen.viewsDF(spark,
      DataGen.hourOfViews(users, items, hourStart, seed = 13L)))
    val botIps = users.filter(_.isBot).map(_.userIp).toSet

    val stats = cleaned
      .select(col("user_ip"), unix_micros(col("ts")))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(BotStatsAggregator.agg.toColumn)

    val flagged = stats.collect().collect {
      case (ip, st) if st.minGapUsUpperBound < 1000000L || st.ratePerHour > 1000 => ip
    }.toSet
    assert(flagged == botIps)

    // min-gap is an upper bound: never below the exact per-event lag result
    val exact = ViewsPipeline.suspiciousByGap(cleaned).collect().map(_.getString(0)).toSet
    assert(exact.subsetOf(stats.collect().collect {
      case (ip, st) if st.minGapUsUpperBound < 1000000L => ip
    }.toSet ++ flagged))
  }

  test("merge accounts for partition-boundary gaps and unordered input safely") {
    import BotStatsAggregator._
    val a = agg
    // two partitions of a 16ms burst split in the middle
    val p1 = Seq(0L, 16000L, 32000L).foldLeft(a.zero)(a.reduce)
    val p2 = Seq(48000L, 64000L).foldLeft(a.zero)(a.reduce)
    val merged = a.finish(a.merge(p1, p2))
    assert(merged.n == 5)
    assert(merged.minGapUsUpperBound == 16000L) // boundary gap 48000-32000 seen
    // interior arrivals only ever overestimate
    val unordered = Seq(0L, 100000L, 50000L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(unordered).minGapUsUpperBound >= 50000L)
  }
}
