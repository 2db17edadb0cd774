package graft

import java.nio.file.Files

import graft.operators.ViewsPipeline
import graft.sources.{DataGen, EventLog}
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** S4/S5 dimension CSV layouts + J1 enrichment inside a streaming query. */
class DimCsvSpec extends SparkSpec {

  private val users = DataGen.users(15, seed = 11L)
  private val items = DataGen.items(30)

  test("items CSV (with header) and users CSV (no header) round-trip the reference layout") {
    val d = Files.createTempDirectory("graft-dims")
    val itemsCsv = d.resolve("items.csv")
    Files.writeString(itemsCsv,
      "item_id,title,description,category\n" +
        items.map(i => s"${i.itemId},${i.title},${i.description},${i.category}").mkString("\n"))
    val itemsDf = EventLog.readItemsCsv(spark, itemsCsv.toString)
    assert(itemsDf.count() == items.size)
    assert(itemsDf.columns.toSeq == Seq("item_id", "title", "description", "category"))

    val usersCsv = d.resolve("users.csv")
    Files.writeString(usersCsv,
      users.map(u => s"${u.userIp},${u.deviceType},${u.deviceId},${if (u.isBot) 1 else 0}")
        .mkString("\n"))
    val usersDf = EventLog.readUsersCsv(spark, usersCsv.toString)
    assert(usersDf.count() == users.size)
    assert(usersDf.filter(col("is_bot") === "1").count() == users.count(_.isBot))
  }

  test("stream-static enrichment join works under readStream (J1 streaming twin)") {
    val h0 = 1700000000L - (1700000000L % 3600)
    val views = DataGen.hourOfViews(users, items, h0, seed = 13L)
    val inDir = Files.createTempDirectory("graft-enrich-in").toString
    DataGen.viewsDF(spark, views).write.mode("overwrite").json(inDir)

    val stream = Streams.viewsStream(spark, inDir)
    val itemsDf = DataGen.itemsDF(spark, items)
      .withColumn("item_id", col("item_id").cast("int"))
    val enriched = ViewsPipeline.enrich(stream, itemsDf)

    val q = enriched.writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("enriched_stream")
    assert(got.count() == views.size) // every event resolved an item
    assert(got.filter(col("category").isNull).count() == 0)
  }
}
