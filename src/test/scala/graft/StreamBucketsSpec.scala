package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps
import graft.streaming.StreamBuckets

/** The streaming per-hour quality-bucket census must equal the batch
  * kernel (the SAME function — withWatermark is eliminated on batch
  * inputs) once the watermark closes each window, with the boundary
  * table coming from q204's oracle-gated threshold chain and hour-0
  * stragglers delivered out of order behind later hours' traffic.
  */
class StreamBucketsSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  test("streaming hourly bucket census equals the batch kernel per closed window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // scores + boundaries from q204's oracle-gated offline half
    val scored = TrainingOps.lmScores(spark, TestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(scored.length > 50, "fixture corpus too small to be meaningful")
    val thr = TrainingOps.tercileThresholds(
      TrainingOps.lmScores(spark, TestSession.sfDir))
    assert(thr.count() > 1, "fixture should cover several languages")

    // deterministic event times spreading the corpus over three hours
    val rows = scored.map { case (id, lang, score) =>
      (ts((id % 3) * 3600 + (id % 60) * 60), lang, score)
    }
    val (hour0, later) = rows.partition(_._1.getTime < t0 + 3600 * 1000)
    val (straggle, punctual) = hour0.splitAt(hour0.length / 3)
    assert(straggle.nonEmpty, "need out-of-order stragglers")
    val sentinel = (ts(86400L * 2), rows.head._2, 0L)
    // hour-0 stragglers arrive AFTER hours 1-2 traffic; the 2-hour
    // watermark keeps hour 0 open until the sentinel closes everything
    val batches = Seq(punctual.toSeq, later.toSeq ++ straggle,
      Seq(sentinel), Seq(sentinel))

    val in = MemoryStream[(Timestamp, String, Long)]
    val docs = in.toDF().toDF("ts", "lang", "lm_score")
    val q = StreamBuckets.hourlyCensus(docs, thr, watermark = "2 hours")
      .writeStream.format("memory").queryName("bucket_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-buckets").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val sentinelHour = sentinel._1.getTime / 3600000L * 3600
    def toMap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = toMap(spark.table("bucket_stream").collect())
      .filterNot { case ((h, _, _), _) => h == sentinelHour }

    // batch twin: the SAME kernel over the same non-sentinel rows
    val expected = toMap(StreamBuckets.hourlyCensus(
      rows.toSeq.toDF("ts", "lang", "lm_score"), thr, watermark = "2 hours")
      .collect())

    assert(got == expected, "streaming census diverges from batch kernel")
    assert(got.keys.map(_._1).toSet.size == 3, "expected three closed hours")
    // the out-of-order stragglers really landed: hour 0 accounts for
    // every hour-0 doc, not just the punctual two-thirds
    val h0 = got.collect { case ((h, _, _), (n, _, _)) if h == t0 / 1000 => n }.sum
    assert(h0 == hour0.length.toLong, "hour-0 stragglers were dropped")
  }
}
