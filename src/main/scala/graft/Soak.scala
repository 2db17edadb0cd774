package graft

import graft.operators.ViewsPipeline
import graft.sources.DataGen

/** Scale soak: run the flagship bot-detection pipeline against a
  * millions-of-rows distributed-generated workload (same distributions
  * as the reference generator) and report throughput + exactness.
  *
  * Usage: Soak [nUsers] [hours]  (default 2000 users x 3 hours ~ 5M rows)
  *
  * This is the local stand-in for the 1000-executor question: generation
  * is executor-side (driver memory stays flat as users/hours scale),
  * detection is two aggregates + a window over one shuffle each, and
  * precision/recall against the generator's ground-truth labels must
  * stay 1.0 — the bot/human rate distributions don't overlap
  * (SURVEY.md §5).
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val nUsers = if (args.length > 0) args(0).toInt else 2000
    val hours = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", "graft-soak")

    val users = DataGen.users(nUsers, seed = 101L)
    val items = DataGen.items(200)
    val truthBots = users.filter(_.isBot).map(_.userIp).toSet

    val t0 = System.nanoTime()
    val cleaned = ViewsPipeline.clean(
      DataGen.distViews(spark, users, items, startEpochS = 1700000000L, hours = hours))
      .persist()
    val nRows = cleaned.count()
    val genS = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val detected = ViewsPipeline.detectSuspicious(cleaned)
      .collect().map(_.getString(0)).toSet
    val detectS = (System.nanoTime() - t1) / 1e9

    val tp = (detected & truthBots).size
    val precision = if (detected.isEmpty) 1.0 else tp.toDouble / detected.size
    val recall = if (truthBots.isEmpty) 1.0 else tp.toDouble / truthBots.size
    println(
      s"""{"metric":"soak","rows":$nRows,"users":$nUsers,"hours":$hours,""" +
        s""""gen_sec":$genS,"detect_sec":$detectS,""" +
        s""""detect_rows_per_sec":${(nRows / detectS).toLong},""" +
        s""""precision":$precision,"recall":$recall}""")
    spark.stop()
  }
}
