package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Drift, IncrementalExactSubstr, TrainingOps}

/** Trained-artifact STALENESS monitors (VERDICT r15 #3/#4): the five
  * train-batch/serve-stream kernels freeze an artifact at train time —
  * StreamSemDedup's codebook, StreamBuckets' tercile boundaries,
  * StreamCusum's per-type μ, StreamDrift's reference CDFs,
  * StreamExactSubstr's duplicated-span dictionary — and serve it as a
  * broadcast. Nothing in the serving path detects when the live
  * distribution has walked away from the artifact; these monitors do.
  *
  * Contract (uniform across all five):
  *  - input is the frozen artifact plus a SLIDING WINDOW of recent
  *    production rows (the curated zone's last N hours — the same
  *    frame a nightly batch sweep reads, or a `foreachBatch` handle);
  *  - output is a small report frame whose last column is a boolean
  *    `retrain` — the flag a scheduler keys the offline retrain job on;
  *  - every statistic is the ENGINE'S OWN trained-quality metric for
  *    that artifact (q144's inertia for the codebook, occupancy-KS for
  *    the terciles — q204 trains them to be terciles, so occupancy IS
  *    the calibration statement, |Δμ| in ppm for CUSUM, q273's KS for
  *    the reference CDFs, novel-duplicated-span share for the
  *    dictionary), in integer permille/ppm so the flag is
  *    deterministic and replay-stable;
  *  - thresholds are explicit parameters with conservative defaults;
  *    ArtifactMonitorSpec proves each flag FIRES on a shifted window
  *    and stays SILENT on a replay of the training distribution.
  *
  * Scale shape: every monitor is one linear pass over the window plus
  * model-sized state (the artifact itself); none shuffles more than a
  * per-key census. They are monitors, not gates — ingest keeps serving
  * the frozen artifact until the retrain lands (STREAMING.md's refresh
  * contract column).
  */
object ArtifactMonitor {

  // ------------------------------------------------------------------
  // 1. StreamSemDedup codebook — q144's inertia discipline
  // ------------------------------------------------------------------

  /** Mean integer squared distance (inertia per point) of `embeddings`
    * to their nearest codebook centroid — the q144 statistic under the
    * SERVING assignment ([[StreamSemDedup.assign]], the shared
    * expression pair). Computed at train time this is the reference;
    * on a window it is the staleness probe. */
  def meanCellD2(embeddings: DataFrame,
      codebook: Seq[StreamSemDedup.Cent]): Long = {
    graft.plans.GraftFunctions.register(embeddings.sparkSession)
    StreamSemDedup.assign(embeddings, codebook)
      .agg(expr("sum(cd) DIV greatest(count(1), 1)"))
      .head.getLong(0)
  }

  /** Codebook-staleness report: window inertia vs the train-time
    * reference, flagging when the ratio exceeds `maxRatioPm` permille
    * (default 2000‰ = window inertia twice the training inertia —
    * rising inertia = drifted corpus = retrain, q144's own scaladoc).
    * One row: (n, ref_d2, window_d2, ratio_pm, retrain). */
  def semCodebookReport(window: DataFrame,
      codebook: Seq[StreamSemDedup.Cent], refMeanD2: Long,
      maxRatioPm: Long = 2000L): DataFrame = {
    graft.plans.GraftFunctions.register(window.sparkSession)
    StreamSemDedup.assign(window, codebook)
      .agg(count(lit(1)).as("n"),
        expr("sum(cd) DIV greatest(count(1), 1)").as("window_d2"))
      .select(col("n"), lit(refMeanD2).as("ref_d2"), col("window_d2"),
        expr(s"(1000 * window_d2) DIV greatest($refMeanD2, 1)").as("ratio_pm"))
      .withColumn("retrain", col("ratio_pm") > maxRatioPm)
  }

  // ------------------------------------------------------------------
  // 2. StreamBuckets tercile boundaries — occupancy calibration
  // ------------------------------------------------------------------

  /** Tercile-boundary staleness: q204 TRAINS (b1, b2) so head/middle/
    * tail each hold one third of the corpus — so the calibration
    * statement IS the bucket occupancy, and the staleness statistic is
    * the 3-bin KS: max |observed cumulative share − k/3| in permille
    * over the two interior boundaries. Flags a language when the
    * deviation exceeds `maxDevPm` (default 150‰). One row per lang:
    * (lang, n, head/middle/tail counts, dev_pm, retrain). */
  def bucketOccupancyReport(window: DataFrame, thresholds: DataFrame,
      maxDevPm: Long = 150L): DataFrame =
    window
      .join(broadcast(thresholds), Seq("lang"))
      .select(col("lang"), TrainingOps.bucketExpr.as("bucket"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bucket") === "head", 1L).otherwise(0L)).as("n_head"),
        sum(when(col("bucket") === "middle", 1L).otherwise(0L)).as("n_middle"),
        sum(when(col("bucket") === "tail", 1L).otherwise(0L)).as("n_tail"))
      // cum shares at the two trained boundaries: head vs 1/3,
      // head+middle vs 2/3 — integer permille with floor division
      .withColumn("dev_pm", expr(
        """greatest(
          |  (1000 * abs(3 * n_head - n)) DIV (3 * n),
          |  (1000 * abs(3 * (n_head + n_middle) - 2 * n)) DIV (3 * n))"""
          .stripMargin))
      .withColumn("retrain", col("dev_pm") > maxDevPm)

  // ------------------------------------------------------------------
  // 3. StreamCusum per-type μ — mean-level displacement
  // ------------------------------------------------------------------

  /** μ-staleness: Page's chart is DEFINED against a fixed reference
    * mean, so the artifact is stale exactly when the window's own
    * hourly mean has walked off it. Recomputes the window μ with the
    * SAME formula that trained the artifact
    * ([[graft.operators.EventsOps.cusumMu]] — spine mean in
    * milli-events/hour) and flags a type when |window − ref| exceeds
    * `maxDevPm` permille of the reference (default 250‰; CUSUM's own
    * slack k = μ/4 — a shift the chart is tuned to ALARM on within
    * hours is a shift the artifact should be retrained for). One row
    * per TRAINED type: (event_type, ref_mu_milli, window_mu_milli,
    * dev_pm, retrain); types absent from the artifact are ignored,
    * exactly as the serving kernel drops them. */
  def cusumMuReport(window: DataFrame, muMilli: Map[String, Long],
      maxDevPm: Long = 250L): DataFrame = {
    val s = window.sparkSession
    import s.implicits._
    val ref = muMilli.toSeq.toDF("event_type", "ref_mu_milli")
    graft.operators.EventsOps.cusumMu(window)
      .withColumnRenamed("mu_milli", "window_mu_milli")
      .join(broadcast(ref), Seq("event_type"))
      .select(col("event_type"), col("ref_mu_milli"), col("window_mu_milli"),
        expr("""(1000 * abs(window_mu_milli - ref_mu_milli))
               |  DIV greatest(ref_mu_milli, 1)""".stripMargin).as("dev_pm"))
      .withColumn("retrain", col("dev_pm") > maxDevPm)
  }

  // ------------------------------------------------------------------
  // 4. StreamDrift reference CDFs — the kernel's own KS, pooled
  // ------------------------------------------------------------------

  /** Reference-CDF staleness: the serving kernel already EMITS hourly
    * KS against the frozen reference — persistent high KS means the
    * reference no longer describes production, not that every hour is
    * anomalous. This pools the window into ONE histogram per source
    * and flags when the pooled KS exceeds `maxKsPm` (default 300‰ —
    * well above hourly sampling noise, well below the 1000‰ of a
    * disjoint distribution). One row per source WITH a reference:
    * (source, n, ks_pm, w1, retrain). */
  def driftReferenceReport(window: DataFrame,
      ref: Map[String, Drift.RefCdf], valueCol: String,
      maxKsPm: Long = 300L): DataFrame = {
    val s = window.sparkSession
    import s.implicits._
    val refs = ref // stable closure capture
    window
      .select(col("source"), col(valueCol).cast("long").as("v"))
      .filter(col("source").isin(refs.keys.toSeq: _*))
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).cast("bigint").as("c"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (src, it) =>
        val hist = it.map(r => r._2 -> r._3).toMap
        val (n, ks, w1) = Drift.ksW1(hist, refs(src))
        (src, n, ks, w1)
      }
      .toDF("source", "n", "ks_pm", "w1")
      .withColumn("retrain", col("ks_pm") > maxKsPm)
  }

  // ------------------------------------------------------------------
  // 5. StreamExactSubstr dictionary — novel duplicated passages
  // ------------------------------------------------------------------

  /** Dictionary staleness: ingest flags only passages the TRAINED
    * dictionary knows; duplicated passages that appear after training
    * sail through (by design — the nightly sweep's job). This measures
    * how much the window duplicates OUTSIDE the dictionary: the share
    * of the window's own duplicated span hashes (the q245/q151 signal,
    * same double-hash, occurrence count > 1) that the dictionary does
    * not contain, in permille; flags when it exceeds `maxNovelPm`
    * (default 200‰ — a fifth of current duplication invisible to
    * ingest). One row: (window_dup_spans, novel_dup_spans, novel_pm,
    * retrain). The dictionary joins as a left-anti side built from the
    * artifact (model-sized — bounded by distinct duplicated spans,
    * the StreamExactSubstr broadcast-budget note applies verbatim). */
  def exactSubstrDictReport(window: DataFrame,
      trained: Seq[StreamExactSubstr.DupAnchor],
      maxNovelPm: Long = 200L): DataFrame = {
    val s = window.sparkSession
    import s.implicits._
    val dict = trained.map(a => (a.h1, a.h2)).toDF("h1", "h2")
    val windowDups = IncrementalExactSubstr.anchors(window)
      .groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select(col("h1"), col("h2"))
      .transform(graft.Graft.stagedCheckpoint) // two census branches below
    val novel = windowDups.join(broadcast(dict), Seq("h1", "h2"), "left_anti")
    windowDups.agg(count(lit(1)).as("window_dup_spans"))
      .crossJoin(novel.agg(count(lit(1)).as("novel_dup_spans")))
      .select(col("window_dup_spans"), col("novel_dup_spans"),
        expr("""(1000 * novel_dup_spans)
               |  DIV greatest(window_dup_spans, 1)""".stripMargin).as("novel_pm"))
      .withColumn("retrain", col("novel_pm") > maxNovelPm)
  }
}
