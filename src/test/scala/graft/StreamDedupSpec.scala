package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamDedup

/** Streaming dedup must admit exactly one copy of each fingerprint when
  * all duplicates arrive within the watermark horizon, and the admitted
  * set must agree with the batch dedup tier's notion of identity (same
  * normalization, same key). Driven through a MemoryStream across
  * several micro-batches with duplicates split across batches.
  */
class StreamDedupSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  // duplicates appear within AND across micro-batches; doc 4 is a
  // whitespace/case variant of doc 1 (same normalized fingerprint);
  // doc 5 is genuinely distinct
  private val batches = Seq(
    Seq((ts(0), 1L, "the quick brown fox"), (ts(5), 2L, "lorem ipsum dolor"),
      (ts(7), 3L, "the quick brown fox")), // dup of 1, same batch
    Seq((ts(60), 4L, "  The   QUICK brown\tfox "), // dup of 1 across batches
      (ts(65), 5L, "an entirely different document")),
    Seq((ts(120), 6L, "lorem ipsum dolor"))) // dup of 2, two batches later

  private def runStream(): Seq[(Long, String)] = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamDedup.dedup(docs, delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sdedup").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table("dedup_stream").select(col("doc_id"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("one survivor per fingerprint; duplicates within the horizon never re-admit") {
    val kept = runStream()
    // exactly one row per distinct fingerprint
    assert(kept.map(_._2).distinct.size == kept.size)
    // three distinct contents → three survivors
    assert(kept.size == 3)
    // the first-arriving copy wins (doc 3/4/6 are the duplicates)
    assert(kept.map(_._1).toSet == Set(1L, 2L, 5L))
  }

  test("stream fingerprints equal the batch tier's on identical content (stream ≡ batch key)") {
    import spark.implicits._
    val flat = batches.flatten.toDF("ts", "doc_id", "text")
    val batchFps = flat.select(col("doc_id"), StreamDedup.fingerprint("text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // normalization folds the whitespace/case variant onto its original
    assert(batchFps(1L) == batchFps(4L) && batchFps(1L) == batchFps(3L))
    assert(batchFps(1L) != batchFps(5L))
    // batch distinct-on-fp count == streaming survivor count
    val batchKept = flat.select(StreamDedup.fingerprint("text").as("fp"))
      .distinct().count()
    assert(batchKept == 3L)
  }
}
