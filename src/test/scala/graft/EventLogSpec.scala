package graft

import java.nio.file.Files

import graft.operators.ViewsPipeline
import graft.sources.{DataGen, EventLog, IncrementalScan}
import org.apache.spark.sql.functions._

class EventLogSpec extends SparkSpec {

  private val users = DataGen.users(15, seed = 11L)
  private val items = DataGen.items(30)
  private val h0 = 1700000000L - (1700000000L % 3600)

  test("hourly CSV round-trip in the reference layout, with partition pruning") {
    val prefix = Files.createTempDirectory("graft-hours").toString
    // land two hours in prefix/YYYY/MM/DD/HH.csv shape (dir per hour)
    Seq(h0, h0 + 3600).foreach { h =>
      val views = DataGen.hourOfViews(users, items, h, seed = h)
      val t = java.time.Instant.ofEpochSecond(h).atZone(java.time.ZoneOffset.UTC)
      val dir = f"$prefix/${t.getYear}%04d/${t.getMonthValue}%02d/${t.getDayOfMonth}%02d/${t.getHour}%02d.csv"
      EventLog.writeHourlyCsv(DataGen.viewsDF(spark, views), dir, singleFile = true)
    }
    val back = EventLog.readHourlyCsv(spark, prefix)
    assert(back.schema.fieldNames.toSeq == EventLog.viewsRawSchema.fieldNames.toSeq)
    val cleaned = ViewsPipeline.clean(back)
    assert(cleaned.count() > 0)
    // both hours present
    val hours = ViewsPipeline.withPartitionColumns(cleaned)
      .select("hour").distinct().count()
    assert(hours == 2)
  }

  test("exact-layout writer lands one object per hour at prefix/YYYY/MM/DD/HH.csv") {
    val prefix = Files.createTempDirectory("graft-exact").toString
    val twoHours = Seq(h0, h0 + 3600).map { h =>
      ViewsPipeline.withPartitionColumns(ViewsPipeline.clean(
        DataGen.viewsDF(spark, DataGen.hourOfViews(users, items, h, seed = h))))
    }.reduce(_ unionByName _)
    EventLog.writeHourlyCsvExact(
      twoHours.select(col("item_id"), col("ts").cast("string"), col("device_type"),
        col("device_id"), col("user_ip"), col("year"), col("month"), col("day"), col("hour")),
      prefix)
    // the EXACT reference paths exist, as single FILES (not directories)
    Seq(h0, h0 + 3600).foreach { h =>
      val t = java.time.Instant.ofEpochSecond(h).atZone(java.time.ZoneOffset.UTC)
      val f = new java.io.File(f"$prefix/${t.getYear}%04d/${t.getMonthValue}%02d/${
        t.getDayOfMonth}%02d/${t.getHour}%02d.csv")
      assert(f.isFile, s"expected single object at $f")
    }
    // no temp residue, and the standard hourly reader sees every row
    assert(!new java.io.File(prefix).listFiles().exists(_.getName.startsWith(".tmp")))
    val back = EventLog.readHourlyCsv(spark, prefix,
      schema = org.apache.spark.sql.types.StructType(EventLog.viewsRawSchema.fields))
    assert(back.count() == twoHours.count())
    // idempotent re-land: same rows, still single objects
    EventLog.writeHourlyCsvExact(
      twoHours.select(col("item_id"), col("ts").cast("string"), col("device_type"),
        col("device_id"), col("user_ip"), col("year"), col("month"), col("day"), col("hour")),
      prefix)
    assert(EventLog.readHourlyCsv(spark, prefix).count() == twoHours.count())
  }

  test("incremental hourly read lists only files newer than the mark") {
    val prefix = Files.createTempDirectory("graft-prune").toString
    Seq(h0, h0 + 3600, h0 + 7200).foreach { h =>
      val t = java.time.Instant.ofEpochSecond(h).atZone(java.time.ZoneOffset.UTC)
      val dir = f"$prefix/${t.getYear}%04d/${t.getMonthValue}%02d/${t.getDayOfMonth}%02d/${t.getHour}%02d.csv"
      EventLog.writeHourlyCsv(
        DataGen.viewsDF(spark, DataGen.hourOfViews(users, items, h, seed = h)), dir)
    }
    val t1 = java.time.Instant.ofEpochSecond(h0 + 3600).atZone(java.time.ZoneOffset.UTC)
    val mark = t1.getYear.toLong * 1000000 + t1.getMonthValue * 10000 +
      t1.getDayOfMonth * 100 + t1.getHour
    val fresh = EventLog.readHourlyCsvSince(spark, prefix, Some(mark))
    // the pruning is at the LISTING: only hour-3 files appear as inputs
    val hours = fresh.inputFiles.map(_.split("/").takeRight(2).head).toSet
    val wantHour = f"${java.time.Instant.ofEpochSecond(h0 + 7200)
      .atZone(java.time.ZoneOffset.UTC).getHour}%02d.csv"
    assert(hours == Set(wantHour), s"listed $hours, want only $wantHour")
    assert(fresh.count() > 0)
    // no mark -> everything
    assert(EventLog.readHourlyCsvSince(spark, prefix, None).inputFiles.length
      > fresh.inputFiles.length)
  }

  test("curated zone round-trips through ORC with identical rows and partitions") {
    val views = DataGen.hourOfViews(users, items, h0, seed = 77L)
    val cleaned = ViewsPipeline.withPartitionColumns(
      ViewsPipeline.clean(DataGen.viewsDF(spark, views)))
    val pq = Files.createTempDirectory("graft-cur-pq").toString
    val orc = Files.createTempDirectory("graft-cur-orc").toString
    EventLog.writeCurated(cleaned, pq)
    EventLog.writeCurated(cleaned, orc, format = "orc")
    val a = spark.read.parquet(pq).collect().map(_.toString).sorted.toSeq
    val b = spark.read.orc(orc).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // hour partition directories exist in both layouts
    assert(new java.io.File(orc).listFiles().exists(_.getName.startsWith("year=")))
  }

  test("spam TSV reader parses label\\ttext") {
    val f = Files.createTempDirectory("graft-tsv").resolve("corpus.tsv")
    val corpus = DataGen.smsCorpus(50)
    Files.writeString(f, corpus.map(l => s"${l.label}\t${l.text}").mkString("\n"))
    val df = EventLog.readSpamTsv(spark, f.toString)
    assert(df.count() == 50)
    assert(df.filter(col("label").isin("ham", "spam")).count() == 50)
  }

  test("incremental step processes only new hours and never reprocesses") {
    val base = Files.createTempDirectory("graft-incr").toString
    val mark = s"$base/mark.txt"; val out = s"$base/curated"

    def land(h: Long) = ViewsPipeline.withPartitionColumns(
      ViewsPipeline.clean(DataGen.viewsDF(spark, DataGen.hourOfViews(users, items, h, seed = h))))

    val hour1 = land(h0)
    val n1 = IncrementalScan.step(spark, hour1, mark, identity, out)
    assert(n1 == hour1.count())
    // re-run with same input: nothing new
    assert(IncrementalScan.step(spark, hour1, mark, identity, out) == 0L)
    // add a later hour: only it is processed
    val hour2 = land(h0 + 3600)
    val both = hour1.unionByName(hour2)
    val n2 = IncrementalScan.step(spark, both, mark, identity, out)
    assert(n2 == hour2.count())
    // curated zone has exactly one copy of everything
    assert(spark.read.parquet(out).count() == hour1.count() + hour2.count())
  }

  test("checkpointed streaming sink is exactly-once across restarts") {
    val base = Files.createTempDirectory("graft-ckpt").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"; val snap = s"$base/snap"
    new java.io.File(inDir).mkdirs()
    import spark.implicits._
    Seq.empty[(String, java.sql.Timestamp)].toDF("user_ip", "expires_at")
      .write.mode("overwrite").parquet(snap)

    val views1 = DataGen.hourOfViews(users, items, h0, seed = 1L)
    DataGen.viewsDF(spark, views1).write.mode("append").json(inDir)
    def run(): Unit = graft.streaming.Streams.runToCompletion(
      graft.streaming.Streams.filteredSink(
        graft.streaming.Streams.viewsStream(spark, inDir), snap, outDir, ckpt))
    run()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst == views1.size)
    // restart with no new data: no duplicates
    run()
    assert(spark.read.parquet(outDir).count() == afterFirst)
    // restart with one more hour: only the delta lands
    val views2 = DataGen.hourOfViews(users, items, h0 + 3600, seed = 2L)
    DataGen.viewsDF(spark, views2).write.mode("append").json(inDir)
    run()
    assert(spark.read.parquet(outDir).count() == views1.size + views2.size)
  }
}
