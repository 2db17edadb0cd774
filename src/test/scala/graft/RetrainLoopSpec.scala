package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EventsOps
import graft.streaming.{ArtifactMonitor, StreamCusum, StreamSemDedup}

/** Closes the staleness loop the ArtifactMonitor tier opened: the
  * retrain flag must be ACTIONABLE. For a representative pair of
  * hand-offs this proves the full cycle —
  *
  *   serve frozen artifact → distribution shifts → monitor FIRES →
  *   retrain on the flagged window → the SAME monitor goes silent →
  *   the serving kernel restarted with the refreshed artifact is
  *   immediately stream ≡ batch on the post-shift traffic.
  *
  * Covered: the keyed-scalar artifact (StreamCusum's per-type μ,
  * driven end-to-end through the streaming kernel restart) and the
  * model artifact (StreamSemDedup's codebook, through the inertia
  * monitor pair). The restart step is the production contract
  * STREAMING.md documents: artifacts ride as broadcast literals, so a
  * refresh IS a query restart with the new literal — state from the
  * stale incarnation is discarded with its checkpoint, and the batch
  * twin defines what the fresh incarnation must emit.
  */
class RetrainLoopSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def ts(h: Long, m: Long) = new Timestamp(t0 + (h * 3600 + m * 60) * 1000)

  test("CUSUM mu: fire -> retrain -> silent -> restarted kernel is stream = batch under the new mu") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // regime 1 (training horizon): 1 event/hour for hours 0..23;
    // regime 2 (the monitored window): 3/hour for hours 24..47 — a
    // tripled level, far past the 250 permille default.
    val train = (0L to 23L).map(h => (ts(h, 0), "a"))
    val window = (24L to 47L).flatMap(h => (0L until 3L).map(m => (ts(h, m), "a")))
    val trainDf = train.toDF("ts", "event_type")
    val windowDf = window.toDF("ts", "event_type")

    val mu0 = EventsOps.cusumMu(trainDf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mu0("a") == 1000L, "regime-1 spine mean must train at 1000 milli")

    // the frozen artifact drifted off the live window: flag fires
    val fired = ArtifactMonitor.cusumMuReport(windowDf, mu0).head
    assert(fired.getBoolean(4), s"tripled traffic must flag, dev_pm=${fired.getLong(3)}")
    assert(fired.getLong(3) == 2000L, "|3000-1000|/1000 = 2000 permille exactly")

    // retrain on the flagged window — the monitor's own prescription —
    // and the same monitor goes silent on that window
    val mu1 = EventsOps.cusumMu(windowDf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val silent = ArtifactMonitor.cusumMuReport(windowDf, mu1).head
    assert(!silent.getBoolean(4) && silent.getLong(3) == 0L,
      "retrained mu must calibrate exactly on its own window")

    // hot-swap: restart the serving kernel with mu1 (fresh checkpoint,
    // fresh state — the broadcast-literal refresh contract) and replay
    // the window; it must equal the batch chart, whose internal mu IS
    // mu1 because cusumChart trains on the frame it charts
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamCusum.chart(in.toDF().toDF("ts", "event_type"), mu1)
      .writeStream.format("memory").queryName("retrain_cusum")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-retrain").toString)
      .start()
    // zz sentinels push the watermark past hour 47 so it finalizes;
    // untrained types are dropped by the kernel, exactly as in serving
    val sentinels = Seq(Seq((ts(24 * 5, 0), "zz")), Seq((ts(24 * 5, 1), "zz")))
    try (Seq(window) ++ sentinels).foreach { b =>
      in.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("retrain_cusum").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    val batch = EventsOps.cusumChart(windowDf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(got == batch,
      "restarted kernel must equal the batch chart under the retrained mu")
    assert(got.size == 24, "every window hour must finalize")
    // a freshly calibrated chart over its own training regime must not
    // alarm anywhere — the reset the retrain exists to deliver
    assert(got.values.forall(_._4 == 0),
      "no alarms under the refreshed artifact on its own regime")
  }

  test("SemDedup codebook: fire -> retrain -> the inertia monitor recalibrates") {
    val emb = Tables.embeddings(spark, TestSession.sfDir)
    val cb0 = StreamSemDedup.trainCodebook(emb)
    val ref0 = ArtifactMonitor.meanCellD2(emb, cb0)

    // the corpus walks away from the codebook: flag fires
    val shifted = emb.withColumn("embedding",
      transform(col("embedding"), x => x + lit(5.0f)))
    val fired = ArtifactMonitor.semCodebookReport(shifted, cb0, ref0).head
    assert(fired.getBoolean(4), s"shifted space must flag, ratio_pm=${fired.getLong(3)}")

    // retrain codebook AND reference inertia on the flagged window;
    // the monitor recalibrates to exactly 1000 permille by definition
    val cb1 = StreamSemDedup.trainCodebook(shifted)
    val ref1 = ArtifactMonitor.meanCellD2(shifted, cb1)
    val silent = ArtifactMonitor.semCodebookReport(shifted, cb1, ref1).head
    assert(!silent.getBoolean(4) && silent.getLong(3) == 1000L,
      "retrained codebook must calibrate at exactly 1000 permille on its window")
    // and the refreshed codebook genuinely fits the new space better
    // than the stale one did (inertia strictly improves)
    val staleD2 = ArtifactMonitor.meanCellD2(shifted, cb0)
    assert(ref1 < staleD2,
      s"retrained inertia $ref1 must beat the stale codebook's $staleD2")
  }
}
