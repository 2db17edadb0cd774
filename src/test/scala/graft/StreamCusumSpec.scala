package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.StreamCusum

/** The streaming CUSUM chart must produce EXACTLY batch q227's rows
  * once the watermark passes all input, given the batch-trained per-
  * type μ (the StreamBuckets train/serve split). The stream runs the
  * textbook recurrence from O(1) state while batch runs the closed
  * form, so this replay closes the recurrence ≡ closed form ≡ SQL
  * triangle q227's unit spec opened. Fixture: gap hours (zero-fill),
  * out-of-order delivery inside the watermark, a sustained level
  * shift that drives the alarm, and a type absent from μ that must be
  * dropped.
  */
class StreamCusumSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def ts(h: Long, m: Long) = new Timestamp(t0 + (h * 3600 + m * 60) * 1000)

  // type a: 1 event/hour for hours 0..23 (skipping 5 — gap), then a
  // SUSTAINED shift to 8/hour for hours 24..39. μ trains on the WHOLE
  // series (3775 milli), so the excess 8000 − μ − μ/4 ≈ 3282/hour
  // needs ~10 shift hours to integrate past the 8μ threshold — the
  // drift-accumulation behavior that distinguishes CUSUM from q225's
  // level detector. Hour 10 arrives out of order in batch 2 (batch 1's
  // max is hour 11 minute 0 → watermark 10:30, so a 10:50 event is
  // still accepted). type c has no trained mu and must vanish.
  // zz: watermark sentinel.
  private val batch1: Seq[(Timestamp, String)] =
    (0L to 11L).filterNot(h => h == 5 || h == 10).map(h => (ts(h, 0), "a")) ++
      Seq((ts(2, 0), "c"), (ts(3, 0), "c"))
  private val batch2: Seq[(Timestamp, String)] =
    Seq((ts(10, 50), "a")) ++
      (12L to 23L).map(h => (ts(h, 0), "a")) ++
      (24L to 39L).flatMap(h => (0L until 8L).map(_ => (ts(h, 0), "a")))
  private val sentinels: Seq[Seq[(Timestamp, String)]] =
    Seq(Seq((ts(24 * 5, 0), "zz")), Seq((ts(24 * 5, 1), "zz")))

  test("streaming CUSUM equals the batch chart given the batch-trained mu") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchEvents = (batch1 ++ batch2).toDF("ts", "event_type")
    val mu = EventsOps.cusumMu(batchEvents.filter(col("event_type") === "a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = StreamCusum.chart(events, mu)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-cusum").toString)
      .start()
    try (Seq(batch1, batch2) ++ sentinels).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("cusum_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap

    val batch = EventsOps.cusumChart(batchEvents.filter(col("event_type") === "a"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap

    assert(got == batch, "stream output diverges from batch q227 chart")
    assert(got.nonEmpty, "type a must emit every finalized hour")
    assert(!got.keys.exists(_._1 == "c"), "an untrained type must be dropped")
    assert(got.values.exists(_._4 == 1), "the sustained shift must alarm")
    // the alarm, once the shift accumulates, must STAY up (CUSUM is a
    // drift integrator, not a point detector)
    val alarms = got.toSeq.sortBy(_._1._2).map(_._2._4)
    assert(alarms.dropWhile(_ == 0).forall(_ == 1),
      "the integrated alarm must be monotone on this monotone-shift fixture")
  }
}
