package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Streaming twin of q204's bucketing stage — the ONLINE half of the
  * CCNet split (Wenzek et al., LREC 2020): the LM and the per-language
  * quality boundaries are trained OFFLINE (q204's oracle-gated
  * `lmScores`/`tercileThresholds`), and incoming documents are then
  * classified against that frozen model as they arrive.
  *
  * Shape: the |langs|-row boundary table joins STREAM-STATIC as a
  * broadcast (stateless — no join state accumulates), the bucket
  * assignment is the exact `TrainingOps.bucketExpr` CASE the batch
  * query plans (shared code, not a re-implementation), and a
  * watermarked tumbling window emits each hour's per-(lang, bucket)
  * census once the watermark closes it (append mode; ST3's late
  * policy applies to stragglers). State per open window is at most
  * |langs| x 3 aggregation rows plus two score extremes each —
  * independent of traffic volume, which is what lets the census run
  * indefinitely at production rates.
  *
  * Because `withWatermark` is eliminated on batch inputs, this SAME
  * function is the batch kernel the replay spec compares against —
  * the stream ≡ batch proof covers the whole pipeline, not a twin
  * transcription of it.
  */
object StreamBuckets {

  /** Per closed hour: (hour_start, lang, bucket, n_docs, min_score,
    * max_score) for a stream of scored docs (ts, lang, lm_score) and
    * a static (lang, b1, b2) boundary table. */
  def hourlyCensus(docs: DataFrame, thresholds: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    docs.withWatermark("ts", watermark)
      .join(broadcast(thresholds), Seq("lang"))
      .select(col("ts"), col("lang"),
        TrainingOps.bucketExpr.as("bucket"), col("lm_score"))
      .groupBy(window(col("ts"), "1 hour"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("lm_score")).as("min_score"),
        max(col("lm_score")).as("max_score"))
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("lang"), col("bucket"), col("n_docs"),
        col("min_score"), col("max_score"))
}
