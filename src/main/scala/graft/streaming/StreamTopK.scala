package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Stream-NATIVE windowed top-K via transformWithState — the tightest
  * match for the reference's Kinesis-Analytics stage (diagram.svg:3):
  * count state AND the top-K cut both live inside the stream operator,
  * no foreachBatch decoration (contrast Streams.popularityTopK, the
  * two-stage split kept for engines without state-v2).
  *
  * One keyed state machine per tumbling window:
  *   - input rows bump per-item counts in a MapState (hash-partitioned
  *     by window key — the shuffle is the same one a windowed groupBy
  *     pays, no extra exchange);
  *   - an event-time timer fires when the watermark passes window end,
  *     emits exactly the k (count desc, item asc) winners once, and
  *     CLEARS the state — state per key lives only until its window
  *     finalizes, the same bound a watermarked agg enjoys;
  *   - late rows for an already-emitted window re-register a timer in
  *     the past; it fires next batch and re-emits nothing (the map was
  *     cleared and stays empty below k counts only if new late rows
  *     arrived — Spark's watermark drops truly-late rows upstream
  *     before they reach the processor).
  *
  * State size per window key = distinct items in that window (the same
  * as the agg it replaces); timers are one per open window.
  */
object StreamTopK {

  final case class ItemEvent(window_start_ms: Long, item_id: Int)
  final case class RankedItem(window_start_ms: Long, item_id: Int, c: Long, rk: Int)

  /** Per-window count + top-k processor (key = window start millis). */
  final class WindowTopKProcessor(k: Int, windowMs: Long)
      extends StatefulProcessor[Long, ItemEvent, RankedItem] {

    @transient private var counts: MapState[Int, Long] = _
    @transient private var timerSet: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[Int, Long](
        "counts", Encoders.scalaInt, Encoders.scalaLong, TTLConfig.NONE)
      timerSet = getHandle.getValueState[Boolean](
        "timerSet", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ItemEvent],
        tv: TimerValues): Iterator[RankedItem] = {
      rows.foreach { r =>
        val c = if (counts.containsKey(r.item_id)) counts.getValue(r.item_id) else 0L
        counts.updateValue(r.item_id, c + 1)
      }
      if (!timerSet.exists()) {
        // fire when the watermark passes window end (watermark delay is
        // already folded into getCurrentWatermarkInMs's advance)
        getHandle.registerTimer(key + windowMs)
        timerSet.update(true)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[RankedItem] = {
      val top = counts.iterator().toSeq
        .sortBy { case (id, c) => (-c, id) }
        .take(k)
      counts.clear()
      timerSet.clear()
      top.iterator.zipWithIndex.map { case ((id, c), i) =>
        RankedItem(key, id, c, i + 1)
      }
    }
  }

  /** A2/A3 stream-native twin: top-`k` items per tumbling `windowDur`
    * window, emitted once per window when the watermark closes it.
    * Input: a cleaned views stream with ts + int item_id. */
  def popularityTopK(events: DataFrame, k: Int = 3,
      windowDur: String = "10 minutes",
      watermark: String = "15 minutes"): Dataset[RankedItem] = {
    val windowMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(windowDur))
    val ms = windowMs.days * 86400000L + windowMs.microseconds / 1000L
    require(windowMs.months == 0 && ms > 0, s"need a fixed-length window, got $windowDur")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(
        (floor(unix_millis(col("ts")) / ms) * ms).cast("long").as("window_start_ms"),
        col("item_id").cast("int").as("item_id"))
      .as[ItemEvent]
      .groupByKey(_.window_start_ms)
      .transformWithState(new WindowTopKProcessor(k, ms),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
