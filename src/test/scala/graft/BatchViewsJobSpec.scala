package graft

import java.nio.file.Files

import graft.jobs.BatchViewsJob
import graft.sources.{DataGen, EventLog}
import org.apache.spark.sql.functions._

class BatchViewsJobSpec extends SparkSpec {

  test("Glue-job equivalent: detect -> snapshot -> incremental filtered curated zone") {
    val users = DataGen.users(20, seed = 11L)
    val items = DataGen.items(40)
    val h0 = 1700000000L - (1700000000L % 3600)
    val botIps = users.filter(_.isBot).map(_.userIp).toSet
    val base = Files.createTempDirectory("graft-job").toString
    val prefix = s"$base/in"; val snap = s"$base/snap"
    val out = s"$base/curated"; val mark = s"$base/mark"

    def landHour(h: Long): Long = {
      val views = DataGen.hourOfViews(users, items, h, seed = h)
      val t = java.time.Instant.ofEpochSecond(h).atZone(java.time.ZoneOffset.UTC)
      val dir = f"$prefix/${t.getYear}%04d/${t.getMonthValue}%02d/${t.getDayOfMonth}%02d/${t.getHour}%02d.csv"
      EventLog.writeHourlyCsv(DataGen.viewsDF(spark, views), dir, singleFile = true)
      views.count(v => !botIps.contains(v.userIp))
    }

    val human1 = landHour(h0)
    // step 1: detection job builds the TTL'd snapshot
    val nSuspicious = BatchViewsJob.detectAndSnapshot(spark, prefix, snap)
    assert(nSuspicious == botIps.size)

    // step 2: ETL job lands hour 1, filtered
    val r1 = BatchViewsJob.run(spark, prefix, snap, out, mark)
    assert(r1.rowsProcessed > 0)
    val curated1 = spark.read.parquet(out)
    assert(curated1.count() == human1)
    assert(curated1.filter(col("user_ip").isin(botIps.toSeq: _*)).count() == 0)

    // step 3: re-run = bookmark no-op
    assert(BatchViewsJob.run(spark, prefix, snap, out, mark).rowsProcessed == 0)

    // step 4: next hour arrives; only it is processed
    val human2 = landHour(h0 + 3600)
    val r2 = BatchViewsJob.run(spark, prefix, snap, out, mark)
    assert(r2.rowsProcessed > 0)
    assert(spark.read.parquet(out).count() == human1 + human2)
  }
}
