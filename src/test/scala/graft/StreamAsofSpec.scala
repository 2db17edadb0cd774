package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** The streaming as-of attribution (two chained stateful operators:
  * time-interval stream-stream join, then watermarked aggregation) must
  * produce EXACTLY the batch rule's output — `reviewAsof` is written so
  * the same code runs on batch frames (watermarks/windows are no-ops /
  * plain functions there), and this spec feeds the same rows both ways
  * across several micro-batches, with out-of-order delivery inside the
  * watermark. */
class StreamAsofSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  test("streaming as-of attribution equals the batch rule (append mode)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val vIn = MemoryStream[(Timestamp, Long, String)]
    val rIn = MemoryStream[(Timestamp, Long, String, Int)]
    val views = vIn.toDF().toDF("ts", "item_id", "user_ip")
    val reviews = rIn.toDF().toDF("ts", "item_id", "user_ip", "review_stars")

    val q = Streams.reviewAsof(views, reviews)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-asof").toString)
      .start()

    // three micro-batches; batch 2 delivers a view out of order (ts 80s
    // arrives after the 100s review) but inside the 30-minute watermark,
    // so it must still win the as-of for that review
    val vBatches = Seq(
      Seq((ts(0), 1L, "a"), (ts(60), 1L, "a"), (ts(30), 2L, "b")),
      Seq((ts(80), 1L, "a"), (ts(120), 1L, "a")),
      Seq((ts(86400L * 2), 99L, "zz"))) // sentinel: pushes the watermark
    val rBatches = Seq(
      Seq((ts(100), 1L, "a", 5)),
      Seq((ts(200), 1L, "a", 4), (ts(150), 3L, "c", 2)),
      Seq((ts(86400L * 2), 99L, "zz", 1)))
    try {
      vBatches.zip(rBatches).foreach { case (v, r) =>
        vIn.addData(v: _*); rIn.addData(r: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val cutoff = ts(86400L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("review_ts") < cutoff)
        .select("item_id", "user_ip", "review_ts", "review_stars", "last_view_ts")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          r.getInt(3), r.getTimestamp(4)))
        .sortBy(x => (x._1, x._3.getTime)).toSeq

    val got = canon(spark.table("asof_stream"))

    // the SAME function over batch frames is the ground truth
    val vb = vBatches.flatten.toDF("ts", "item_id", "user_ip")
    val rb = rBatches.flatten.toDF("ts", "item_id", "user_ip", "review_stars")
    val expected = canon(Streams.reviewAsof(vb, rb))

    assert(got == expected)
    // and the rule itself does what it says: latest view at or before
    assert(expected == Seq(
      (1L, "a", ts(100), 5, ts(80)),   // out-of-order 80s beats 60s
      (1L, "a", ts(200), 4, ts(120)))) // 150s review on item 3: no view, inner-dropped
  }
}
