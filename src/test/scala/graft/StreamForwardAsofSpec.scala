package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** The streaming forward as-of (Streams.forwardAsof — q190's twin) must
  * emit, after the watermark, exactly the batch forward-asof rule:
  * earliest view at or after each purchase within tolerance, unmatched
  * purchases preserved with NULLs. Mirrors StreamAsofSpec's proof shape
  * with the disorder flipped: the TRUE earliest view arrives a batch
  * AFTER a later view already matched the purchase — the min() aggregate
  * must still settle on it before the watermark finalizes the group.
  */
class StreamForwardAsofSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  test("streaming forward as-of equals the batch rule incl. left semantics") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val pIn = MemoryStream[(Timestamp, Long, Long)]
    val vIn = MemoryStream[(Timestamp, Long, Long)]
    val purchases = pIn.toDF().toDF("ts", "event_id", "user_id")
    val views = vIn.toDF().toDF("ts", "event_id", "user_id")

    val q = Streams.forwardAsof(purchases, views)
      .writeStream.format("memory").queryName("fwd_asof_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-fwd-asof").toString)
      .start()

    // user 1: purchase at t=100; a view at 300 arrives first, the TRUE
    // earliest (t=150) arrives in the next batch — min() must pick 150.
    // user 2: purchase whose only view is outside the 6h tolerance →
    // NULL match (left semantics through the outer join).
    // user 3: equal-timestamp view must match (>= inclusive).
    val pBatches = Seq(
      Seq((ts(100), 10L, 1L), (ts(50), 20L, 2L), (ts(70), 30L, 3L)),
      Seq.empty[(Timestamp, Long, Long)],
      Seq((ts(86400L * 2), 99L, 99L)))
    val vBatches = Seq(
      Seq((ts(300), 11L, 1L)),
      Seq((ts(150), 12L, 1L), (ts(50 + 7 * 3600), 21L, 2L), (ts(70), 31L, 3L)),
      Seq((ts(86400L * 2), 98L, 99L)))
    try {
      pBatches.zip(vBatches).foreach { case (p, v) =>
        pIn.addData(p: _*); vIn.addData(v: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val cutoff = ts(86400L)
    val got = spark.table("fwd_asof_stream")
      .filter(col("purchase_ts") < cutoff)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getTimestamp(4))))
      .sortBy(_._1).toSeq

    assert(got == Seq(
      (10L, 1L, Some(12L), Some(ts(150))),  // late-arriving earlier view wins
      (20L, 2L, None, None),                // out-of-tolerance: NULL, row kept
      (30L, 3L, Some(31L), Some(ts(70)))),  // equal timestamp matches (>=)
      s"unexpected: $got")

    // and the batch q190 kernel agrees on the same rows (matched pairs)
    val ev = (pBatches.flatten.map(e => (e._1, e._2, e._3, "purchase")) ++
      vBatches.flatten.map(e => (e._1, e._2, e._3, "view")))
      .filter(_._3 != 99L)
      .toDF("ts", "event_id", "user_id", "event_type")
    val e = ev.select(col("event_id").as("id"), col("user_id").as("k"),
      unix_micros(col("ts")).as("t"), col("event_type"))
    val batch = graft.operators.TemporalJoins.asofKernel(
        build = e.filter(col("event_type") === "view").withColumn("t", -col("t")),
        probe = e.filter(col("event_type") === "purchase").withColumn("t", -col("t")))
      .select(col("id"),
        when(col("t") - col("b_t") <= 21600000000L, col("b_id")).as("view_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got.map(g => g._1 -> g._3).toMap == batch,
      "stream and batch forward as-of disagree")
  }
}
