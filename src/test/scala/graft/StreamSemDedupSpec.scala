package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamSemDedup

/** Streaming semantic dedup (StreamSemDedup) stream ≡ batch: with a
  * batch-trained codebook, the stream must admit exactly the rows the
  * nightly batch sweep would keep (first arrival per semantic cell),
  * the scan-side assignment must agree with a Scala argmin recompute
  * (it is the batch tier's shared expression), and near-duplicate
  * EMBEDDINGS — different vec_ids, perturbed components — must dedup
  * while distant ones survive.
  */
class StreamSemDedupSpec extends SparkSpec {
  import spark.implicits._

  graft.plans.GraftFunctions.register(spark)

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  /** Three well-separated anchor directions in 4-d. */
  private def anchor(k: Int): Seq[Float] = Seq.tabulate(4)(i => if (i == k) 1f else 0f)
  private def perturb(v: Seq[Float], eps: Float): Seq[Float] =
    v.zipWithIndex.map { case (x, i) => x + (if (i == (i % v.size)) eps else 0f) }

  // training corpus: vec_ids 0..8 spread over the anchors — k = max(8,
  // floor(sqrt 9)) = 8, so centroids are vecs 0..7 (the q205 first-k
  // convention)
  private val trainRows: Seq[(Long, Seq[Float])] =
    (0L until 9L).map(i => (i, perturb(anchor((i % 3).toInt), 0.001f * i)))

  private def codebook = StreamSemDedup.trainCodebook(
    trainRows.toDF("vec_id", "embedding"))

  // arrivals: 100 lands near anchor 0; 101 is a PARAPHRASE of it (same
  // direction, small perturbation -> same nearest centroid); 102 is
  // semantically distant (anchor 1); 103 re-arrives near anchor 0 in a
  // later batch, still within the horizon; 104 lands near anchor 2
  private val batches = Seq(
    Seq((ts(0), 100L, perturb(anchor(0), 0.02f)),
      (ts(5), 101L, perturb(anchor(0), 0.03f)),
      (ts(8), 102L, perturb(anchor(1), 0.02f))),
    Seq((ts(60), 103L, perturb(anchor(0), 0.01f)),
      (ts(65), 104L, perturb(anchor(2), 0.01f))))

  private def runStream(): Seq[(Long, Long)] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Seq[Float])]
    val docs = in.toDF().toDF("ts", "vec_id", "embedding")
    val q = StreamSemDedup.dedup(docs, codebook, delay = "10 minutes")
      .writeStream.format("memory").queryName("semdedup_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssem").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.table("semdedup_stream").select(col("vec_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("stream ≡ batch: survivors equal the nightly sweep's first-per-cell rows") {
    val kept = runStream()
    val swept = StreamSemDedup.batchSweep(
      batches.flatten.toDF("ts", "vec_id", "embedding"), codebook)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept.toSet == swept,
      s"stream kept ${kept.toSet}, batch sweep keeps $swept")
    // one survivor per cell
    assert(kept.map(_._2).distinct.size == kept.size)
  }

  test("paraphrase arrivals dedup; distant ones survive") {
    val kept = runStream().map(_._1).toSet
    assert(kept.contains(100L), "first arrival in its cell must be admitted")
    assert(!kept.contains(101L), "same-cell paraphrase in the same batch must drop")
    assert(!kept.contains(103L), "same-cell re-arrival across batches must drop")
    assert(kept.contains(102L) && kept.contains(104L),
      "semantically distant arrivals must survive")
  }

  test("intra-batch disorder: cell-set contract holds (one survivor per cell)") {
    // same-cell rows arrive LATER-timestamp-first inside one micro-batch
    // — dropDuplicatesWithinWatermark keeps the processing-order first,
    // so row identity may differ from the batch sweep's canonical
    // (ts, vec_id)-min pick, but the deduped CELL SET and one-per-cell
    // invariant must match it exactly (see StreamSemDedup.batchSweep's
    // scaladoc for the two-tier contract)
    val disordered = Seq(Seq(
      (ts(65), 200L, perturb(anchor(0), 0.02f)), // later ts, processed first
      (ts(60), 201L, perturb(anchor(0), 0.03f)),
      (ts(62), 202L, perturb(anchor(1), 0.02f))))
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Seq[Float])]
    val q = StreamSemDedup.dedup(in.toDF().toDF("ts", "vec_id", "embedding"),
      codebook, delay = "10 minutes")
      .writeStream.format("memory").queryName("semdedup_disorder")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssemd").toString)
      .start()
    try disordered.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val kept = spark.table("semdedup_disorder").select(col("vec_id"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sweptCells = StreamSemDedup.batchSweep(
      disordered.flatten.toDF("ts", "vec_id", "embedding"), codebook)
      .select(col("cid")).collect().map(_.getLong(0)).toSet
    assert(kept.map(_._2).toSet == sweptCells, "deduped cell set diverged")
    assert(kept.map(_._2).distinct.length == kept.length, "cell emitted twice")
    assert(kept.length == 2, s"expected 2 survivors, got $kept")
  }

  test("scan-side assignment equals a Scala argmin recompute (shared batch expression)") {
    val cb = codebook
    val rows = batches.flatten
    val got = StreamSemDedup.assign(rows.toDF("ts", "vec_id", "embedding"), cb)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def iv(v: Seq[Float]): Seq[Long] =
      v.map(x => math.round(BigDecimal(x.toDouble).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 10000))
    val want = rows.map { case (_, id, v) =>
      val q = iv(v)
      id -> cb.map(c => (c.icv.zip(q).map { case (a, b) =>
        val d = a - b; d * d
      }.sum, c.cid)).min._2
    }.toMap
    assert(got == want, s"assignment diverged: got $got want $want")
  }
}
