package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Drift
import graft.streaming.StreamDrift

/** The streaming drift monitor must emit EXACTLY the batch drift
  * chart's rows once the watermark passes all input — replayed across
  * micro-batches with out-of-order delivery inside the watermark, a
  * gap hour (hours are independent: no row, no zero-fill), a source
  * with no reference (must stay silent), and a shifted-distribution
  * hour whose KS/W1 must be strictly positive.
  */
class StreamDriftSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def ts(h: Long, m: Long) = new Timestamp(t0 + (h * 3600 + m * 60) * 1000)

  // reference: src a lengths uniform over {100, 200, 300}
  private def refDocs = {
    import spark.implicits._
    (0 until 30).map(i => ("a", 100L + 100L * (i % 3))).toDF("source", "n_chars")
  }

  // hour 0: matches the reference exactly (KS small); hour 1 skipped
  // (gap); hour 2: shifted hard right (all 900) → KS = 1000; hour 2
  // also gets one late-but-inside-watermark row in batch 2. source
  // "nobody" has no reference and must be dropped.
  private val batch1: Seq[(String, Timestamp, Long)] =
    (0 until 12).map(i => ("a", ts(0, i.toLong), 100L + 100L * (i % 3))) ++
      (0 until 9).map(i => ("a", ts(2, 0), 900L)) ++
      Seq(("nobody", ts(0, 5), 500L))
  private val batch2: Seq[(String, Timestamp, Long)] = Seq(("a", ts(2, 20), 900L))
  private val sentinels: Seq[Seq[(String, Timestamp, Long)]] =
    Seq(Seq(("a", ts(24, 0), 100L)), Seq(("a", ts(24, 1), 100L)))

  test("streaming drift equals the batch kernel after the watermark passes") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = Drift.referenceCdfs(refDocs, "n_chars")
    assert(ref.keySet == Set("a") && ref("a").n == 30)

    val in = MemoryStream[(String, Timestamp, Long)]
    val docs = in.toDF().toDF("source", "ts", "v")
    val q = StreamDrift.chart(docs, ref)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-drift").toString)
      .start()
    try (Seq(batch1, batch2) ++ sentinels).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("drift_stream")
      .filter(col("epoch_hour") < (t0 / 3600000L) + 24)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val batch = Drift.driftChart(
        (batch1 ++ batch2).toDF("source", "ts", "v"), ref, "v")
      .collect()
      .map(r => (r.source, r.epoch_hour) ->
        ((r.n_window, r.ks_pm, r.w1_milli))).toMap

    assert(got == batch, "stream output diverges from batch drift kernel")
    val h0 = t0 / 3600000L
    assert(got.keySet == Set(("a", h0), ("a", h0 + 2)),
      "exactly the two observed closed hours; gap hour emits nothing")
    // hour 0 replicates the reference distribution exactly → KS 0
    assert(got(("a", h0)) == ((12L, 0L, 0L)), s"matched hour: ${got(("a", h0))}")
    // hour 2 is fully right-shifted: supremum gap = 1 → KS 1000, and
    // the late row arrived inside the watermark (n_window = 10)
    val (n2, ks2, w12) = got(("a", h0 + 2))
    assert(n2 == 10L && ks2 == 1000L && w12 > 0L, s"shifted hour: ${got(("a", h0 + 2))}")
    // brute-force the shifted hour against the pure kernel
    assert(Drift.ksW1(Map(900L -> 10L), ref("a")) == ((10L, 1000L, w12)))
  }
}
