package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.StreamEwma

/** The streaming EWMA chart must produce EXACTLY batch q225's rows once
  * the watermark passes all input — replayed across micro-batches with
  * out-of-order delivery inside the watermark, on a fixture with GAP
  * hours (the zero-fill path), a type too short to ever fill the 16-lag
  * ring (the must-stay-silent path), and a final spike hour that
  * genuinely fires the flag.
  */
class StreamEwmaSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def ts(h: Long, m: Long) = new Timestamp(t0 + (h * 3600 + m * 60) * 1000)

  // type a: hours 0..19, skipping 7 and 13 entirely (gap → zero fill)
  // and hour 18 delivered OUT OF ORDER in batch 2 (inside the
  // 30-minute watermark: batch 1's max is hour 19 minute 0 — all 40
  // spike events share that timestamp, deliberately, so the watermark
  // sits at 18:30 and an 18:50 event is still accepted; spreading the
  // spike over minutes would advance the watermark past it and Spark
  // would drop the late row before the operator). type b: 10 hours —
  // never fills the ring, must emit nothing. zz: watermark sentinel.
  private val batch1: Seq[(Timestamp, String)] =
    (0L to 17L).filterNot(h => h == 7 || h == 13)
      .flatMap(h => (0L until (1 + h % 3)).map(m => (ts(h, m), "a"))) ++
      (0L until 40L).map(_ => (ts(19, 0), "a")) ++
      (0L to 9L).map(h => (ts(h, 0), "b"))
  private val batch2: Seq[(Timestamp, String)] = Seq((ts(18, 50), "a"))
  private val sentinels: Seq[Seq[(Timestamp, String)]] =
    Seq(Seq((ts(24 * 5, 0), "zz")), Seq((ts(24 * 5, 1), "zz")))

  test("streaming EWMA equals the batch kernel after the watermark passes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = StreamEwma.chart(events)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ewma").toString)
      .start()
    try (Seq(batch1, batch2) ++ sentinels).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ewma_stream")
      .filter(col("event_type") =!= "zz")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap

    val batch = EventsOps.ewmaChart(
        (batch1 ++ batch2).toDF("ts", "event_type"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap

    assert(got == batch, "stream output diverges from batch q225 kernel")
    assert(got.nonEmpty, "type a must emit rows once 16 lags exist")
    assert(!got.keys.exists(_._1 == "b"), "a 10-hour type must stay silent")
    assert(got.values.exists(_._4 == 1), "the hour-19 spike must flag")
    // the zero-filled gap hours must appear as lags, i.e. the emitted
    // hours are exactly the batch spine's tail — spot-check hour 19
    val spikeHour = got.keys.collectFirst { case ("a", h) if h % 24 == 19 => h }
    assert(spikeHour.nonEmpty, "hour 19 must be emitted")
  }
}
