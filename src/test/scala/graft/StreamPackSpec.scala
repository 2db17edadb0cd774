package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamPack

/** The streaming next-fit packer fed the corpus in doc_id order across
  * several micro-batches must land EXACTLY on registered q259's census
  * — same recurrence (PackState.step, shared code), same truncation,
  * same derived columns — proving the keyed-state handoff between
  * batches preserves the open bin.
  */
class StreamPackSpec extends SparkSpec {

  test("streaming packing census equals batch q259 after an in-order feed") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, TestSession.sfDir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._2)
    assert(docs.length > 100, "fixture corpus too small to be meaningful")

    // three in-order batches: the packer must carry half-filled bins
    // across micro-batch boundaries to get this right
    val batches = docs.grouped(math.max(1, docs.length / 3 + 1)).toSeq
    assert(batches.length >= 2, "need multiple micro-batches")

    val in = MemoryStream[(String, Long, String)]
    val stream = in.toDF().toDF("source", "doc_id", "text")
    val q = StreamPack.census(stream)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-pack").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val sunk = spark.table("pack_stream").collect()
      .map(r => (r.getString(0), (1 to 6).map(r.getLong).toVector))
    // update mode re-emits a source's running census each batch that
    // touches it: the FINAL census is the max-n_docs row per source
    val got = sunk.groupBy(_._1).map { case (src, xs) =>
      src -> xs.map(_._2).maxBy(_.head)
    }
    // several sources must have emitted more than once, or the feed
    // never exercised the cross-batch state handoff
    assert(sunk.groupBy(_._1).values.exists(_.length > 1),
      "every source fit in one micro-batch — handoff untested")

    val expected = SparkEntry.all.find(_.name == "q259_nextfit_packing").get
      .run(spark, TestSession.sfDir).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong).toVector).toMap

    assert(got == expected, "streaming packing census diverges from batch q259")
    assert(got.keySet.size >= 10, "expected a real source spread")
  }
}
