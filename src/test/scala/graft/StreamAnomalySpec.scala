package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.StreamAnomaly

/** The streaming anomaly detector must produce EXACTLY the batch
  * kernel's rows once the watermark passes all input — replayed across
  * micro-batches with out-of-order delivery inside the watermark
  * (StreamFunnelSpec's proof shape), on a fixture where the z>3 flag
  * genuinely FIRES (five calm payments then a spike against a
  * now-excluded frame).
  */
class StreamAnomalySpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  // (ts, user_id, event_id, value):
  //   user 1: five ~10.00 payments inside 6h, then 500.00 — the spike's
  //     prior frame is calm, z >> 3 → anomaly; delivered with the 4th
  //     calm payment OUT OF ORDER in a later micro-batch (within the
  //     30-minute watermark: batch 1's max is ts(3000), so batch 2 may
  //     reorder anything at/after ts(1200) — Spark itself drops rows
  //     older than the watermark before the stateful operator);
  //   user 2: same spike but only 4 prior events → n>=5 gate holds it;
  //   user 3: two events at the SAME timestamp (peers) — both judged
  //     against the earlier frame only, neither against the other;
  //   user 99: watermark sentinel (filtered from the comparison).
  private val batches = Seq(
    Seq((ts(0), 1L, 1L, 10.00), (ts(600), 1L, 2L, 10.50),
      (ts(1200), 1L, 3L, 9.75), (ts(2400), 1L, 5L, 10.10),
      (ts(0), 2L, 10L, 10.00), (ts(600), 2L, 11L, 10.50),
      (ts(3000), 1L, 6L, 500.00),
      (ts(100), 3L, 20L, 10.00), (ts(200), 3L, 21L, 11.00),
      (ts(300), 3L, 22L, 12.00),
      (ts(400), 3L, 23L, 10.00), (ts(400), 3L, 24L, 300.00)), // peers
    Seq((ts(1800), 1L, 4L, 10.25), // out of order: before the spike
      (ts(1300), 2L, 12L, 9.75), (ts(1900), 2L, 13L, 10.25),
      (ts(3100), 2L, 14L, 500.00)),
    Seq((ts(86400L * 2), 99L, 99L, 1.0)), // sentinel: pushes the watermark
    Seq((ts(86400L * 2 + 10), 99L, 100L, 1.0)))

  private def eventRows = batches.flatten.filter(_._2 != 99L)

  test("streaming anomaly equals the batch kernel after the watermark passes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_id", "value")
    val q = StreamAnomaly.detect(events)
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-anom").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("anomaly_stream")
      .filter(col("user_id") =!= 99L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
      .toMap

    val batch = EventsOps.rollingAnomaly(
        eventRows.toDF("ts", "user_id", "event_id", "value"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
      .toMap

    assert(got.keySet == batch.keySet, "event coverage diverges")
    assert(got == batch, "stream != batch on (n_frame, dev2, thr, anomaly)")
    // the fixture exercises what it claims to:
    assert(batch(6L)._4 == 1, "user 1's spike must flag")
    assert(batch(6L)._1 == 5L)
    assert(batch(14L)._4 == 0, "user 2's spike is gated by n>=5")
    assert(batch(14L)._1 == 4L)
    // peers judge against the earlier frame only (n=3 for both),
    // and the calmer peer is not condemned by the wilder one
    assert(batch(23L)._1 == 3L && batch(24L)._1 == 3L)
    assert(batch(23L)._4 == 0)
  }

  test("q149 flags fire on a spike fixture through the batch kernel") {
    import spark.implicits._
    val rows = EventsOps.rollingAnomaly(
        eventRows.toDF("ts", "user_id", "event_id", "value"))
      .collect().map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(rows.values.sum >= 1, "no anomaly fired on the spike fixture")
  }
}
