package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** The streaming first-touch attribution (Streams.sessionAttribution)
  * must emit, once the watermark passes, EXACTLY the sessions the batch
  * gap rule (q167's kernel) derives from the same rows — entry type
  * picked through out-of-order delivery included, since min(struct) is
  * arrival-order-insensitive. Mirrors StreamFunnelSpec's proof shape:
  * micro-batches with in-watermark disorder, a far-future sentinel to
  * close every session, append-mode memory sink.
  */
class StreamAttributionSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  // user 1: one session whose TRUE entry (a view at t=0) arrives in
  // batch 2, AFTER the purchase — the entry pick must still find it;
  // a second session (> 2h later) with no purchase.
  // user 2: purchase-entry session (entry type = purchase).
  private val batches = Seq(
    Seq((ts(60), 1L, 2L, "click", 5.0), (ts(300), 1L, 3L, "purchase", 80.0),
      (ts(10), 2L, 4L, "purchase", 40.0)),
    Seq((ts(0), 1L, 1L, "view", 1.0), // out of order: the real entry
      (ts(120), 2L, 5L, "view", 2.0),
      (ts(9000), 1L, 6L, "signup", 3.0)), // 2nd session for user 1
    Seq((ts(86400L * 2), 99L, 99L, "view", 0.0)), // sentinel: closes all
    Seq((ts(86400L * 2 + 10), 99L, 100L, "view", 0.0)))

  test("streaming session attribution equals the batch gap-rule kernel") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_id", "event_type", "value")
    val q = Streams.sessionAttribution(events)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-attr").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val got = spark.table("attr_stream")
      .filter(col("user_id") =!= 99L)
      .select(col("user_id"), col("entry_type"), col("purchase_cents"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch kernel: sort per user, split on gap > 2h, fold sessions
    val rows = batches.flatten.filter(_._2 != 99L)
    val expected = rows.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._1.getTime, e._3)).toVector
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, e) =>
        if (e._1.getTime - acc.last.last._1.getTime > 7200 * 1000) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }
      sessions.map { sess =>
        val cents = sess.collect { case (_, _, _, "purchase", v) =>
          (BigDecimal(v).setScale(2) * 100).toLongExact }.sum
        (u, sess.head._4, cents, sess.size.toLong)
      }
    }.toSet

    assert(got == expected, s"stream $got != batch $expected")
    // the fixture exercised what it claims: an out-of-order entry pick
    assert(expected.exists { case (u, ty, c, _) => u == 1L && ty == "view" && c == 8000L },
      "user 1's first session must enter on the late-arriving view")
    assert(expected.exists { case (u, ty, _, _) => u == 2L && ty == "purchase" },
      "user 2's session must enter on a purchase")
  }
}
