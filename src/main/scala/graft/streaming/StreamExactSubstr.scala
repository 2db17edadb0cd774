package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.IncrementalExactSubstr

/** Streaming ExactSubstr flagging — the ingest half of q245's
  * long-passage dedup (Lee et al. 2021 §4.1), train-batch/serve-stream:
  * the batch tier (or the [[IncrementalExactSubstr]] anchor store)
  * trains the DUPLICATED-SPAN DICTIONARY — the (h1, h2) double hashes
  * of every 50-token window known to repeat in the corpus, bounded by
  * duplicated content, which is exactly the artifact ExactSubstr's
  * suffix array exists to produce — and every arriving document is
  * scored against it ROW-LOCALLY: its windows hash scan-side (the
  * same absolute double-hash the store rows carry), membership is an
  * array_contains against the broadcast dictionary, and the removal
  * plan (covered tokens, merged-run count, longest run — q245's exact
  * row semantics) folds out of the sorted hit positions in ONE
  * aggregate() HOF pass, no explode, no shuffle, no state.
  *
  * ZERO streaming state: the kernel is a pure projection, so it runs
  * at any rate indefinitely — the strongest state bound in the kernel
  * table. The trade is the hand-off size: the dictionary rides as a
  * broadcast literal (the StreamBuckets/StreamSemDedup trained-
  * parameter pattern); at dictionary sizes past broadcast budget the
  * formulation flips to window-explode + stream-static semi-join on
  * the store parquet + a watermark-keyed regroup — same semantics,
  * state bounded by in-flight documents. NOVEL duplicates (both copies
  * arriving after training) are deliberately out of scope at ingest:
  * catching them is the nightly batch q245 / censusDelta sweep's job,
  * the same division of labor as StreamDedup vs q26 and StreamSemDedup
  * vs q205.
  */
object StreamExactSubstr {

  /** One dictionary entry — a case class so the typedLit literal
    * carries the `h1`/`h2` field names the membership probe builds. */
  final case class DupAnchor(h1: Long, h2: Long)

  /** Batch-train the dictionary: every double-hash that occurs more
    * than once in the corpus. Collected to the driver: bounded by
    * DISTINCT DUPLICATED SPANS (the ExactSubstr output artifact),
    * never by corpus size. */
  def trainDupAnchors(docs: DataFrame): Seq[DupAnchor] =
    IncrementalExactSubstr.anchors(docs)
      .groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .select(col("h1"), col("h2"))
      .collect()
      .map(r => DupAnchor(r.getLong(0), r.getLong(1)))
      .sortBy(a => (a.h1, a.h2))

  private val L = IncrementalExactSubstr.L

  /** Row-local removal plan against the dictionary: appends `n_tokens`,
    * `dup_tokens`, `n_runs`, `longest_run` to a frame carrying `text`,
    * and keeps only documents with at least one dictionary hit. Works
    * identically on batch and streaming frames — the equivalence
    * anchor StreamExactSubstrSpec drives. */
  def flag(df: DataFrame, trained: Seq[DupAnchor]): DataFrame = {
    val dict: Column = typedLit(trained)
    val span = s"concat_ws(' ', slice(w, CAST(i AS INT), $L))"
    val out = df
      .withColumn("w", filter(split(col("text"), "\\s+"), x => x =!= ""))
      .withColumn("n_tokens", size(col("w")).cast("bigint"))
      .withColumn("__dict", dict)
      // sorted hit positions: sequence() ascends, transform preserves
      // order, filter keeps it — so the fold below sees i's in order
      .withColumn("hits", expr(
        s"""filter(
           |  transform(
           |    CASE WHEN size(w) >= $L
           |         THEN sequence(CAST(1 AS BIGINT), size(w) - ${L - 1})
           |         ELSE array() END,
           |    i -> named_struct('i', i,
           |      'h1', xxhash64($span), 'h2', xxhash64($span, 1L))),
           |  s -> array_contains(__dict, named_struct('h1', s.h1, 'h2', s.h2)))
           |""".stripMargin))
      .filter(size(col("hits")) > 0)
      // interval merge (q245's gaps-and-islands) as a row-local fold:
      // windows at i1 < i2 merge iff i2 <= i1 + L; state carries the
      // running union size, run count, best run, and the current run's
      // (start, prev) pair
      .withColumn("plan", expr(
        s"""aggregate(hits,
           |  named_struct('cov', CAST(0 AS BIGINT), 'runs', CAST(0 AS BIGINT),
           |    'best', CAST(0 AS BIGINT), 'start', CAST(0 AS BIGINT),
           |    'prev', CAST(-${2 * L} AS BIGINT)),
           |  (s, x) -> CASE
           |    WHEN x.i - s.prev <= $L THEN named_struct(
           |      'cov', s.cov + (x.i - s.prev), 'runs', s.runs,
           |      'best', greatest(s.best, x.i + $L - s.start),
           |      'start', s.start, 'prev', x.i)
           |    ELSE named_struct(
           |      'cov', s.cov + $L, 'runs', s.runs + 1,
           |      'best', greatest(s.best, CAST($L AS BIGINT)),
           |      'start', x.i, 'prev', x.i) END)""".stripMargin))
      .withColumn("dup_tokens", col("plan.cov"))
      .withColumn("n_runs", col("plan.runs"))
      .withColumn("longest_run", col("plan.best"))
      .drop("w", "__dict", "hits", "plan")
    out
  }
}
