package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Funnel
import graft.streaming.StreamFunnel

/** The streaming funnel must produce EXACTLY the batch kernel's rows
  * once the watermark passes all input — replayed across several
  * micro-batches with out-of-order delivery inside the watermark,
  * mirroring StreamAsofSpec's proof shape. The operator emits an
  * append-mode changelog with monotone n_events, so "current answer" =
  * the row with max n_events per user.
  */
class StreamFunnelSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  // (ts, user_id, event_id, event_type) micro-batches: user 1 completes
  // v->c->p only thanks to an OUT-OF-ORDER click delivered in batch 2
  // with an event time before the purchase; user 2 stalls at depth 1;
  // user 3's purchase-before-view must not count as depth 3
  private val batches = Seq(
    Seq((ts(0), 1L, 1L, "view"), (ts(300), 1L, 3L, "purchase"),
      (ts(10), 2L, 4L, "view"), (ts(20), 3L, 5L, "purchase")),
    Seq((ts(120), 1L, 2L, "click"), // out of order: before the purchase
      (ts(400), 2L, 6L, "error"), (ts(410), 3L, 7L, "view")),
    Seq((ts(86400L * 2), 99L, 99L, "view")), // sentinel: pushes the watermark
    // nudge: the flush timeouts armed under the pre-sentinel watermark
    // fire while this batch (or the no-data batch after the sentinel)
    // runs with the advanced watermark
    Seq((ts(86400L * 2 + 10), 99L, 100L, "view")))

  private def runStream(steps: Seq[String]): Map[Long, (Long, Int)] = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_id", "event_type")
    val q = StreamFunnel.funnel(events, steps)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-funnel").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table("funnel_stream")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("funnel_depth"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.funnel_depth"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
  }

  private def runBatch(steps: Seq[String]): Map[Long, (Long, Int)] = {
    import spark.implicits._
    val df = batches.flatten.filter(_._2 != 99L)
      .toDF("ts", "user_id", "event_id", "event_type")
    Funnel.funnelDepth(df, steps)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
  }

  test("streaming funnel equals the batch kernel after watermark passes (v,c,p)") {
    val got = runStream(Seq("v", "c", "p")) - 99L
    val expected = runBatch(Seq("v", "c", "p"))
    assert(got == expected)
    // and the rule does what it says, incl. the out-of-order click
    assert(expected(1L) == ((3L, 3)))
    assert(expected(2L) == ((2L, 1)))
    assert(expected(3L) == ((2L, 1))) // purchase precedes view: depth 1 only
  }

  test("streaming funnel equals the batch kernel on a 5-step pattern") {
    val steps = Seq("v", "c", "p", "v", "e")
    assert((runStream(steps) - 99L) == runBatch(steps))
  }

  test("streaming predicate funnel equals the batch kernel (q122's steps)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // value-carrying fixture: user 1 needs the OUT-OF-ORDER qualifying
    // click AND must skip the under-threshold view (value 5 < 10) and
    // under-threshold purchase (value 20 < 50); user 2's view qualifies
    // but its purchase comes before any click
    val valueBatches = Seq(
      Seq((ts(0), 1L, 1L, "view", 5.0), (ts(30), 1L, 2L, "view", 25.0),
        (ts(300), 1L, 4L, "purchase", 20.0), (ts(360), 1L, 5L, "purchase", 80.0),
        (ts(10), 2L, 6L, "view", 50.0), (ts(40), 2L, 7L, "purchase", 90.0)),
      Seq((ts(120), 1L, 3L, "click", 0.0), // out of order: before both purchases
        (ts(400), 2L, 8L, "click", 0.0)),
      Seq((ts(86400L * 2), 99L, 99L, "view", 99.0)), // sentinel: pushes the watermark
      Seq((ts(86400L * 2 + 10), 99L, 100L, "view", 99.0))) // nudge: fires the flush
    val steps = Seq(
      col("event_type") === "view" && col("value") >= 10.0,
      col("event_type") === "click",
      col("event_type") === "purchase" && col("value") >= 50.0)

    val in = MemoryStream[(Timestamp, Long, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_id", "event_type", "value")
    val q = StreamFunnel.funnelPredicates(events, steps)
      .writeStream.format("memory").queryName("funnel_pred_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-funnel-pred").toString)
      .start()
    try valueBatches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("funnel_pred_stream")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("funnel_depth"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.funnel_depth"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap - 99L

    val batchDf = valueBatches.flatten.filter(_._2 != 99L)
      .toDF("ts", "user_id", "event_id", "event_type", "value")
    val expected = Funnel.funnelDepthPredicates(batchDf, steps)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == expected)
    assert(expected(1L) == ((5L, 3))) // qualifying view -> ooo click -> 80.0 purchase
    assert(expected(2L) == ((3L, 2))) // purchase precedes the click: stalls at 2
  }

  test("streaming windowed funnel equals the batch kernel (q123's semantics)") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val w = 12L * 3600 * 1000000 // 12h in micros
    // user 1's chain only closes from the SECOND view (7200s): the
    // purchase at 13h is outside the first view's window but inside the
    // second's — exercises the max-anchor rule; the click arrives OUT
    // OF ORDER (event time before the purchase). user 2's purchase
    // precedes its click, stalling at depth 2.
    val wBatches = Seq(
      Seq((ts(0), 1L, 1L, "view"), (ts(7200), 1L, 2L, "view"),
        (ts(46800), 1L, 4L, "purchase"),
        (ts(10), 2L, 5L, "view"), (ts(3610), 2L, 6L, "purchase")),
      Seq((ts(18000), 1L, 3L, "click"), // out of order: before the purchase
        (ts(7210), 2L, 7L, "click")),
      Seq((ts(86400L * 4), 99L, 99L, "view")), // sentinel: pushes the watermark
      Seq((ts(86400L * 4 + 10), 99L, 100L, "view"))) // nudge: fires the flush
    val steps = Seq(
      col("event_type") === "view",
      col("event_type") === "click",
      col("event_type") === "purchase")

    val in = MemoryStream[(Timestamp, Long, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_id", "event_type")
    // 14h watermark: the fixture spans 13h of event time delivered out
    // of order, so nothing may finalize before the sentinel arrives
    val q = StreamFunnel.funnelWindowed(events, steps, w, watermark = "14 hours")
      .writeStream.format("memory").queryName("funnel_win_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-funnel-win").toString)
      .start()
    try wBatches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("funnel_win_stream")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("funnel_depth"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.funnel_depth"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap - 99L

    val batchDf = wBatches.flatten.filter(_._2 != 99L)
      .toDF("ts", "user_id", "event_id", "event_type")
    val expected = Funnel.funnelDepthWindowed(batchDf, steps, w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == expected)
    assert(expected(1L) == ((4L, 3))) // second view anchors the in-window chain
    assert(expected(2L) == ((3L, 2))) // purchase precedes the click: stalls at 2
  }

  test("idle TTL evicts quiet keys; a replayed key restarts from zero") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Long, String)]
    val events = in.toDF().toDF("ts", "user_id", "event_id", "event_type")
    val q = StreamFunnel.funnel(events, Seq("v", "c", "p"),
        idleTtlMs = Some(60000L)) // 1 minute of event time
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-funnel-ttl").toString)
      .start()
    try {
      // user 1 views, then goes quiet; watermark (driven by user 50's
      // advancing clock, 30-min delay) passes ts0 then ts0+ttl, so user
      // 1's view is finalized (emit (1,1)) and the state then expires.
      // Each quiet step needs its own batch: a timeout only fires in a
      // batch whose watermark (from the PREVIOUS batch) has passed its
      // arm, and a key receiving data in a batch is not timed out.
      in.addData((ts(0), 1L, 1L, "view"), (ts(10), 50L, 2L, "view"))
      q.processAllAvailable()
      in.addData((ts(7200), 50L, 3L, "view")) // after: wm = ts(5400)
      q.processAllAvailable()
      in.addData((ts(7210), 50L, 4L, "view")) // u1 flush fires; eviction armed wm+60s
      q.processAllAvailable()
      in.addData((ts(9000), 50L, 5L, "view")) // after: wm = ts(7200) > arm
      q.processAllAvailable()
      in.addData((ts(9010), 50L, 6L, "view")) // u1 eviction fires (no data, no pending)
      q.processAllAvailable()
      // user 1 reappears AFTER eviction: counts restart, not resume
      in.addData((ts(9100), 1L, 7L, "click"))
      q.processAllAvailable()
      in.addData((ts(86400L * 3), 99L, 8L, "view")) // push wm past the click
      q.processAllAvailable()
      in.addData((ts(86400L * 3 + 10), 99L, 9L, "view")) // fire the flush
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_ttl")
      .filter(col("user_id") === 1L)
      .select(col("n_events"), col("funnel_depth"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // first incarnation finalized (1 view, depth 1); post-eviction
    // incarnation saw only the click: n restarts at 1 with depth 0
    assert(rows == Set((1L, 1), (1L, 0)), s"got $rows")
  }
}
