package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.operators.Dedup
import graft.streaming.StreamExactSubstr

/** Streaming ExactSubstr flagging (kernel #16) stream ≡ batch: the
  * row-local fold must reproduce q245's removal-plan rows exactly when
  * the dictionary covers the corpus' duplicated spans, the stream must
  * emit the same rows as the batch twin across micro-batches, and
  * novel (untrained) duplicates must pass unflagged — the nightly
  * batch sweep's job, not ingest's.
  */
class StreamExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")
  private def doc(id: Long, ws: Seq[String]): (Long, String) = (id, ws.mkString(" "))

  private val p1 = toks("p1", 55)
  private val p2 = toks("p2", 60)
  private val corpus = Seq(
    doc(1L, toks("a", 5) ++ p1 ++ toks("b", 3) ++ p2),
    doc(2L, p1 ++ toks("c", 8)),
    doc(3L, p2),
    doc(4L, toks("d", 70)))

  private lazy val trained =
    StreamExactSubstr.trainDupAnchors(corpus.toDF("doc_id", "text"))

  test("row-local fold ≡ q245's census on the trained corpus") {
    val got = StreamExactSubstr.flag(corpus.toDF("doc_id", "text"), trained)
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        col("n_runs"), col("longest_run"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = Dedup.exactSubstrCensus(corpus.toDF("doc_id", "text"), 50)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"fold census $got != q245 census $want")
    assert(got(1L)._3 == 2L, "doc 1 must carry two merged runs")
  }

  test("stream ≡ batch across micro-batches; novel duplicates unflagged") {
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
    def ts(off: Long) = new Timestamp(t0 + off * 1000)
    val novel = toks("novel", 52) // duplicated only AFTER training
    val batches = Seq(
      Seq((ts(0), 10L, (toks("e", 4) ++ p1).mkString(" ")),
        (ts(5), 11L, toks("f", 80).mkString(" "))),
      Seq((ts(60), 12L, (p2 ++ toks("g", 6)).mkString(" ")),
        (ts(65), 13L, novel.mkString(" ")),
        (ts(70), 14L, novel.mkString(" ")))) // novel dup pair
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = StreamExactSubstr.flag(
      in.toDF().toDF("ts", "doc_id", "text"), trained)
      .writeStream.format("memory").queryName("exactsubstr_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ses").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val streamRows = spark.table("exactsubstr_stream")
      .select(col("doc_id"), col("dup_tokens"), col("n_runs"), col("longest_run"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batchRows = StreamExactSubstr.flag(
      batches.flatten.toDF("ts", "doc_id", "text"), trained)
      .select(col("doc_id"), col("dup_tokens"), col("n_runs"), col("longest_run"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamRows == batchRows, s"stream $streamRows != batch $batchRows")
    // trained passages flagged with full coverage
    assert(streamRows.map(_._1) == Set(10L, 12L))
    assert(streamRows.find(_._1 == 10L).get._2 == 55L) // p1 fully covered
    // novel duplicates (13/14) and clean doc (11) pass unflagged
    assert(!streamRows.exists(r => Set(11L, 13L, 14L).contains(r._1)))
  }
}
