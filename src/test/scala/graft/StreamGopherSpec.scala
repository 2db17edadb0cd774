package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamGopher

/** The streaming per-hour rule-battery census must equal the batch
  * kernel (the SAME function — withWatermark is eliminated on batch
  * inputs) once the watermark closes each window, with hour-0
  * stragglers delivered out of order behind later hours' traffic.
  */
class StreamGopherSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  test("streaming hourly gopher census equals the batch kernel per closed window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(docs.length > 100, "fixture corpus too small to be meaningful")

    // deterministic event times spreading the corpus over three hours
    val rows = docs.map { case (id, src, text) =>
      (ts((id % 3) * 3600 + (id % 60) * 60), src, text)
    }
    val (hour0, later) = rows.partition(_._1.getTime < t0 + 3600 * 1000)
    val (straggle, punctual) = hour0.splitAt(hour0.length / 3)
    assert(straggle.nonEmpty, "need out-of-order stragglers")
    val sentinel = (ts(86400L * 2), rows.head._2, rows.head._3)
    val batches = Seq(punctual.toSeq, later.toSeq ++ straggle,
      Seq(sentinel), Seq(sentinel))

    val in = MemoryStream[(Timestamp, String, String)]
    val stream = in.toDF().toDF("ts", "source", "text")
    val q = StreamGopher.hourlyCensus(stream, watermark = "2 hours")
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gopher").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val sentinelHour = sentinel._1.getTime / 3600000L * 3600
    def toMap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getString(1)) ->
        ((2 to 9).map(r.getLong).toVector)).toMap
    val got = toMap(spark.table("gopher_stream").collect())
      .filterNot { case ((h, _), _) => h == sentinelHour }

    // batch twin: the SAME kernel over the same non-sentinel rows
    val expected = toMap(StreamGopher.hourlyCensus(
      rows.toSeq.toDF("ts", "source", "text"), watermark = "2 hours")
      .collect())

    assert(got == expected, "streaming census diverges from batch kernel")
    assert(got.keys.map(_._1).toSet.size == 3, "expected three closed hours")
    // the out-of-order stragglers really landed
    val h0 = got.collect { case ((h, _), v) if h == t0 / 1000 => v.head }.sum
    assert(h0 == hour0.length.toLong, "hour-0 stragglers were dropped")
    // and the census agrees with registered q206 when the window spans
    // the whole corpus: summing the three hours per source reproduces
    // the batch query's per-source counts (all but the permille, which
    // doesn't add across windows)
    val q206 = SparkEntry.all.find(_.name == "q206_gopher_rules").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => r.getString(0) -> (1 to 7).map(r.getLong).toVector).toMap
    val summed = got.toSeq.groupBy(_._1._2).map { case (src, xs) =>
      src -> xs.map(_._2.take(7)).reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
    }
    assert(summed == q206, "hourly census does not roll up to q206")
  }
}
