package graft

import java.nio.file.Files

import graft.operators.ViewsPipeline
import graft.sources.DataGen
import graft.streaming.{StatefulDetect, Streams}

class StatefulDetectSpec extends SparkSpec {

  test("stateful stream detector flags exactly the labeled bots, once each") {
    val users = DataGen.users(25, seed = 11L)
    val items = DataGen.items(50)
    val hourStart = 1700000000L - (1700000000L % 3600)
    val views = DataGen.hourOfViews(users, items, hourStart, seed = 13L)
    val botIps = users.filter(_.isBot).map(_.userIp).toSet
    assert(botIps.nonEmpty)

    val inDir = Files.createTempDirectory("graft-state-in").toString
    DataGen.viewsDF(spark, views).write.mode("overwrite").json(inDir)

    val stream = Streams.viewsStream(spark, inDir, maxFilesPerTrigger = 2)
    // processAllAvailable + stop, not AvailableNow: with processing-time
    // timeouts the trigger keeps scheduling batches to fire future
    // timeouts and the query never self-terminates.
    val q = StatefulDetect.suspicious(stream, idleTtl = None)
      .writeStream.format("memory").queryName("suspicious_stateful")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("suspicious_stateful").collect()
    val gotIps = got.map(_.getString(0)).toSet
    assert(gotIps == botIps, s"got=$gotIps want=$botIps")
    // emitted exactly once per bot even across micro-batches
    assert(got.length == botIps.size)
  }

  test("rate spike is flagged even when the same batch rolls into the next hour") {
    import graft.sources.DataGen.{TsFormat, View}
    import java.time.Instant
    def fmt(s: Long): String = TsFormat.format(Instant.ofEpochSecond(s))
    val t0 = 1700000000L - (1700000000L % 3600)
    // 1200 events in hour t0 (over the 1000/hr threshold, but >=2s apart
    // so the gap signal stays silent) followed by ONE event in the next
    // hour, all in a single file -> a single micro-batch. A detector
    // that checks the rate only after folding the whole batch sees the
    // counter already reset by the rollover event and never flags.
    val views = (0 until 1200).map(i =>
      View("1000", fmt(t0 + i * 2), "mobile:ios", "111111", "20.0.0.77")) :+
      View("1000", fmt(t0 + 3600 + 5), "mobile:ios", "111111", "20.0.0.77")
    val inDir = Files.createTempDirectory("graft-state-roll").toString
    DataGen.viewsDF(spark, views).coalesce(1).write.mode("overwrite").json(inDir)

    val q = StatefulDetect.suspicious(
        Streams.viewsStream(spark, inDir, maxFilesPerTrigger = 10), idleTtl = None)
      .writeStream.format("memory").queryName("suspicious_rollover")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("suspicious_rollover").collect()
    assert(got.length == 1 && got.head.getString(1) == "rate",
      s"expected one 'rate' flag, got ${got.mkString(",")}")
  }
}
