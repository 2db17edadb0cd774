package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamShard

/** The streaming per-hour shard-ingest manifest must equal the batch
  * kernel (the SAME function — withWatermark is eliminated on batch
  * inputs) once the watermark closes each window, with hour-0
  * stragglers delivered out of order behind later hours' traffic; and
  * its additive columns must roll up across hours to registered
  * q217's whole-corpus manifest (the re-export audit).
  */
class StreamShardSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  test("streaming hourly shard manifest equals the batch kernel and rolls up to q217") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(docs.length > 50, "fixture corpus too small to be meaningful")

    val rows = docs.map { case (id, text, nc) =>
      (ts((id % 3) * 3600 + (id % 60) * 60), id, text, nc)
    }
    val (hour0, later) = rows.partition(_._1.getTime < t0 + 3600 * 1000)
    val (straggle, punctual) = hour0.splitAt(hour0.length / 3)
    assert(straggle.nonEmpty, "need out-of-order stragglers")
    val h = rows.head
    val sentinel = (ts(86400L * 2), h._2, h._3, h._4)
    val batches = Seq(punctual.toSeq, later.toSeq ++ straggle,
      Seq(sentinel), Seq(sentinel))

    val in = MemoryStream[(Timestamp, Long, String, Long)]
    val stream = in.toDF().toDF("ts", "doc_id", "text", "n_chars")
    val q = StreamShard.hourlyManifest(stream, watermark = "2 hours")
      .writeStream.format("memory").queryName("shard_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-shard").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val sentinelHour = sentinel._1.getTime / 3600000L * 3600
    def toMap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getLong(1)) -> ((2 to 7).map(r.getLong).toVector)).toMap
    val got = toMap(spark.table("shard_stream").collect())
      .filterNot { case ((hh, _), _) => hh == sentinelHour }

    val expected = toMap(StreamShard.hourlyManifest(
      rows.toSeq.toDF("ts", "doc_id", "text", "n_chars"),
      watermark = "2 hours").collect())
    assert(got == expected, "streaming manifest diverges from batch kernel")
    assert(got.keys.map(_._1).toSet.size == 3, "expected three closed hours")
    val h0 = got.collect { case ((hh, _), v) if hh == t0 / 1000 => v.head }.sum
    assert(h0 == hour0.length.toLong, "hour-0 stragglers were dropped")

    // re-export audit: the four ADDITIVE manifest columns summed across
    // hours per shard must reproduce registered q217's whole-corpus
    // manifest (first/last doc are order statistics — they don't add)
    val q217 = SparkEntry.all.find(_.name == "q217_shard_manifest").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toVector).toMap
    val summed = got.toSeq.groupBy(_._1._2).map { case (shard, xs) =>
      shard -> xs.map(_._2.take(4)).reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
    }
    assert(summed == q217, "hourly manifests do not roll up to q217")
  }
}
