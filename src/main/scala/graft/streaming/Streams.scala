package graft.streaming

import graft.operators.ViewsPipeline
import graft.sources.EventLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming twins of the reference's streaming stages
  * (SURVEY.md §2.8 ST1-ST5): file-source streams stand in for Kinesis;
  * watermarked windowed aggregates stand in for Kinesis Analytics; a
  * foreachBatch re-read of the suspicious-IP snapshot stands in for the
  * per-record DynamoDB lookup (fresh per micro-batch, exactly the TTL
  * snapshot staleness model SURVEY.md §7 flags).
  */
object Streams {

  /** S2 streaming twin: JSON-lines views stream from a directory. */
  def viewsStream(s: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame =
    s.readStream
      .schema(EventLog.viewsRawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
      .transform(ViewsPipeline.clean)

  /** A2 streaming twin: windowed popularity counts with watermark
    * (append mode emits only finalized windows — the late-data policy
    * ST3). */
  def popularity(events: DataFrame, windowDur: String = "10 minutes",
      watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("item_id"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("window_start"), col("item_id"), col("c"))

  /** A4 streaming twin: high-traffic windows over threshold → K5 alert
    * rows. */
  def highTraffic(events: DataFrame, windowDur: String = "5 minutes",
      watermark: String = "15 minutes", threshold: Long = 100): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > threshold)
      .select(col("w.start").as("window_start"), col("c"))

  /** F1 streaming twin: IP filter with a per-micro-batch snapshot
    * re-read. Spark caches a static join side for the life of the query;
    * re-reading inside foreachBatch is what keeps the deny-set fresh
    * (SURVEY.md §7 "stream-static staleness"). The filtered batch is
    * appended to `outPath` partitioned by hour — the K3 long-term sink. */
  def filteredSink(events: DataFrame, snapshotPath: String, outPath: String,
      checkpoint: String): DataStreamWriter[Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val snapshot =
          try s.read.parquet(snapshotPath)
          catch { case _: Throwable => // no snapshot yet -> nothing suspicious
            import s.implicits._
            Seq.empty[(String, java.sql.Timestamp)].toDF("user_ip", "expires_at")
          }
        val filtered = ViewsPipeline.filterSuspicious(batch, snapshot, current_timestamp())
        ViewsPipeline.withPartitionColumns(filtered)
          .write.mode("append").partitionBy("year", "month", "day", "hour")
          .parquet(outPath)
        ()
      }

  /** Convenience: run a streaming query over a bounded file directory to
    * completion (Trigger.AvailableNow) and block. Used by batch-parity
    * tests and the K3 backfill path. */
  def runToCompletion(w: DataStreamWriter[Row]): Unit = {
    val q = w.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
