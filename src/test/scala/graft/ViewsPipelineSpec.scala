package graft

import graft.operators.ViewsPipeline
import graft.sources.DataGen
import org.apache.spark.sql.functions._

class ViewsPipelineSpec extends SparkSpec {

  private lazy val users = DataGen.users(40, seed = 11L)
  private lazy val items = DataGen.items(100)
  private lazy val hourStart = 1700000000L - (1700000000L % 3600)
  private lazy val views = DataGen.hourOfViews(users, items, hourStart, seed = 13L)
  private lazy val cleaned = ViewsPipeline.clean(DataGen.viewsDF(spark, views)).cache()
  private lazy val botIps = users.filter(_.isBot).map(_.userIp).toSet

  test("clean parses ts and normalizes the NULL sentinel") {
    val row = cleaned.filter(col("device_type") === "other").limit(1).collect()
    assert(row.forall(_.isNullAt(row.head.fieldIndex("device_id"))))
    assert(cleaned.schema("ts").dataType.typeName == "timestamp")
    assert(cleaned.filter(col("ts").isNull).count() == 0)
  }

  test("bot detection recovers exactly the labeled bot set (precision & recall 1.0)") {
    val detected = ViewsPipeline.detectSuspicious(cleaned)
      .collect().map(_.getString(0)).toSet
    assert(detected == botIps, s"detected=$detected truth=$botIps")
  }

  test("rate-only and gap-only signals each already separate bots at reference distributions") {
    val byRate = ViewsPipeline.suspiciousByRate(cleaned).collect().map(_.getString(0)).toSet
    val byGap = ViewsPipeline.suspiciousByGap(cleaned).collect().map(_.getString(0)).toSet
    assert(byRate == botIps)
    assert(byGap == botIps)
  }

  test("IP filter drops exactly the suspicious rows, honoring TTL expiry") {
    val detected = ViewsPipeline.detectSuspicious(cleaned)
    val live = ViewsPipeline.suspiciousSnapshot(detected, current_timestamp(), ttlHours = 24)
    val filtered = ViewsPipeline.filterSuspicious(cleaned, live, current_timestamp())
    val humanRows = cleaned.filter(!col("user_ip").isin(botIps.toSeq: _*)).count()
    assert(filtered.count() == humanRows)
    // expired snapshot filters nothing
    val expired = ViewsPipeline.suspiciousSnapshot(detected,
      current_timestamp() - expr("INTERVAL 48 HOURS"), ttlHours = 24)
    val unfiltered = ViewsPipeline.filterSuspicious(cleaned, expired, current_timestamp())
    assert(unfiltered.count() == cleaned.count())
  }

  test("enrichment join brings category; popularity top-k ranks by count") {
    val enriched = ViewsPipeline.enrich(cleaned, DataGen.itemsDF(spark, items))
    assert(enriched.count() == cleaned.count()) // every item_id resolves
    val top = ViewsPipeline.popularTopK(enriched, "category", "1 hour", 3)
    val rows = top.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rk") <= 3))
    // rank 1 really is the max count
    val counts = enriched.groupBy(col("category")).count()
      .agg(max("count")).head().getLong(0)
    assert(rows.filter(_.getAs[Int]("rk") == 1).forall(_.getAs[Long]("c") == counts))
  }

  test("high-traffic detector fires on the full hour, not on quiet slices") {
    val alerts = ViewsPipeline.highTraffic(cleaned, "1 hour", threshold = 100)
    assert(alerts.count() == 1)
    val quiet = ViewsPipeline.highTraffic(cleaned, "1 hour", threshold = 10000000)
    assert(quiet.count() == 0)
  }

  test("partition columns derive the reference hourly layout") {
    val p = ViewsPipeline.withPartitionColumns(cleaned)
      .select("year", "month", "day", "hour").distinct().collect()
    assert(p.length == 1) // one generated hour -> one partition
  }
}
