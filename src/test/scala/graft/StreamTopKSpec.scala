package graft

import graft.streaming.StreamTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-native top-K (transformWithState): per-window count state +
  * event-time-timer emission, exactly once per closed window, ranked
  * (count desc, item asc). Driven through a MemoryStream so the
  * watermark's advance — and therefore timer firing — is controlled by
  * the test, not wall clock.
  */
class StreamTopKSpec extends SparkSpec {

  private val Provider = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("windowed top-k emits each window once, ranked, after the watermark closes it") {
    val prev = spark.conf.getOption(Provider)
    spark.conf.set(Provider, RocksDb)
    try {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val t0 = 1700000000000L // epoch ms, window-aligned for 10-min windows? ensure below
      val w0 = t0 - (t0 % 600000L) // 10-min window containing t0
      def ts(ms: Long) = new java.sql.Timestamp(ms)

      val in = MemoryStream[(java.sql.Timestamp, Int)]
      val events = in.toDF().toDF("ts", "item_id")
      val ranked = StreamTopK.popularityTopK(events, k = 2,
        windowDur = "10 minutes", watermark = "5 minutes")

      val q = ranked.writeStream.format("memory").queryName("stream_topk")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-tws").toString)
        .start()
      try {
        // window w0: item 7 x3, item 3 x2, item 9 x1 -> top2 = (7,3),(3,2)
        in.addData(
          (ts(w0 + 1000), 7), (ts(w0 + 2000), 7), (ts(w0 + 3000), 7),
          (ts(w0 + 4000), 3), (ts(w0 + 5000), 3),
          (ts(w0 + 6000), 9))
        q.processAllAvailable()
        // nothing emitted yet: watermark has not passed w0's end
        assert(spark.table("stream_topk").count() == 0)

        // advance event time into window w0+2: watermark (max - 5min)
        // passes w0's end -> w0's timer fires
        in.addData((ts(w0 + 2 * 600000L + 1000), 5))
        q.processAllAvailable()
        in.addData((ts(w0 + 2 * 600000L + 2000), 5))
        q.processAllAvailable()

        val rows = spark.table("stream_topk")
          .orderBy(col("window_start_ms"), col("rk"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        assert(rows.toSeq == Seq((w0, 7, 3L, 1), (w0, 3, 2L, 2)),
          s"got ${rows.toSeq}")

        // close the later window too: its own top-k emits exactly once
        in.addData((ts(w0 + 4 * 600000L), 1))
        q.processAllAvailable()
        in.addData((ts(w0 + 5 * 600000L), 1))
        q.processAllAvailable()
        val all = spark.table("stream_topk")
          .orderBy(col("window_start_ms"), col("rk"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        assert(all.toSeq == Seq(
          (w0, 7, 3L, 1), (w0, 3, 2L, 2),
          (w0 + 2 * 600000L, 5, 2L, 1)),
          s"got ${all.toSeq}")
      } finally {
        q.stop()
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Provider, v)
        case None    => spark.conf.unset(Provider)
      }
    }
  }

  test("ties rank by item id ascending; k bounds the emission") {
    val prev = spark.conf.getOption(Provider)
    spark.conf.set(Provider, RocksDb)
    try {
      import spark.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val w0 = 1700000400000L - (1700000400000L % 600000L)
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      val in = MemoryStream[(java.sql.Timestamp, Int)]
      val ranked = StreamTopK.popularityTopK(in.toDF().toDF("ts", "item_id"),
        k = 3, windowDur = "10 minutes", watermark = "1 minutes")
      val q = ranked.writeStream.format("memory").queryName("stream_topk_ties")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-tws2").toString)
        .start()
      try {
        // four items all with count 1: only ids 2,4,6 (asc) fit in k=3
        in.addData((ts(w0), 8), (ts(w0 + 1), 6), (ts(w0 + 2), 4), (ts(w0 + 3), 2))
        q.processAllAvailable()
        in.addData((ts(w0 + 2 * 600000L), 0))
        q.processAllAvailable()
        in.addData((ts(w0 + 3 * 600000L), 0))
        q.processAllAvailable()
        val rows = spark.table("stream_topk_ties")
          .filter(col("window_start_ms") === w0)
          .orderBy(col("rk"))
          .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3)))
        assert(rows.toSeq == Seq((2, 1L, 1), (4, 1L, 2), (6, 1L, 3)), s"got ${rows.toSeq}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(Provider, v)
        case None    => spark.conf.unset(Provider)
      }
    }
  }
}
