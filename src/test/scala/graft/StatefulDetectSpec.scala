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
}
