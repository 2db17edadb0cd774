package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming twin of q206's rule-battery census — the ONLINE half of
  * heuristic quality filtering (Rae et al. 2021): the rule thresholds
  * are fixed offline, and incoming documents are scored against them
  * as they arrive, with each closed hour emitting the per-source
  * per-rule rejection attribution a feed-health monitor watches.
  *
  * Shape: the flags come from `TextOps.gopherFlags` — the EXACT
  * transform batch q206 plans (shared code, not a twin transcription)
  * — so the whole pipeline is covered by the stream ≡ batch replay
  * proof. The battery is stateless row-local math; the only state is
  * the watermarked tumbling-window census, at most |sources| rows of
  * eight counters per open hour — independent of traffic volume.
  * Append mode; ST3's late policy applies to stragglers.
  *
  * Because `withWatermark` is eliminated on batch inputs, this SAME
  * function is the batch kernel the replay spec compares against.
  */
object StreamGopher {

  /** Per closed hour: (hour_start, source, n_docs, five per-rule fail
    * counts, n_pass, pass_permille) for a document stream with
    * columns (ts, source, text). */
  def hourlyCensus(docs: DataFrame, watermark: String = "30 minutes"): DataFrame =
    TextOps.gopherFlags(docs.withWatermark("ts", watermark))
      .groupBy(window(col("ts"), "1 hour"), col("source"))
      .agg(TextOps.gopherCensusAggs.head, TextOps.gopherCensusAggs.tail: _*)
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("source"), col("n_docs"), col("n_fail_words"),
        col("n_fail_wordlen"), col("n_fail_short"), col("n_fail_stop"),
        col("n_fail_rep"), col("n_pass"), col("pass_permille"))
}
