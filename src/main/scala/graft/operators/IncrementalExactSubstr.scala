package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ExactSubstr maintenance against a durable ANCHOR store —
  * q245's long-passage removal census (Lee et al. 2021 §4.1) in the
  * shape a 100 TB ingestion pipeline actually runs it: the corpus'
  * suffix structure was indexed once; every new drop must update the
  * removal plan WITHOUT recomputing (or even re-tokenizing) history.
  *
  * The store holds one row per 50-token window position: (doc_id, i,
  * h1, h2) — two INDEPENDENT 64-bit span hashes (same text, different
  * seed), all row-local and ABSOLUTE (a position's row never depends on
  * the rest of the corpus — the IncrementalDedup property that makes
  * the incremental and full paths provably identical). Duplication =
  * some other position agreeing on BOTH hashes: the double hash stands
  * in for q245's content verification (a false removal needs a
  * simultaneous 128-bit collision), because the store deliberately
  * carries NO text — the whole incremental path runs without ever
  * touching a document body, including n_tokens, which is recovered
  * from the store itself (max anchor position + L - 1).
  *
  * [[censusDelta]] of a new batch:
  *   1. anchors of the new docs only (one pass over the new text);
  *   2. only hashes PRESENT IN THE BATCH can change status — history is
  *      semi-joined against the batch's hash set (broadcast when the
  *      batch is small, shuffled semi-join on a heavy drop — the set is
  *      batch-token-sized, so the strategy is left to AQE; bucketing
  *      the store by h1 co-locates the probe for continuous ingest);
  *   3. affected docs = holders of a batch hash that is now duplicated
  *      (new-new or new-old); their FULL anchor sets come back by a
  *      broadcast doc-key semi-join (doc lists are affected-doc-
  *      bounded), and the duplication status of every hash those docs
  *      hold is counted corpus-wide, pruned to that hash set;
  *   4. the shared interval-merge kernel (Dedup.removalRuns) rebuilds
  *      exactly the affected docs' census rows.
  *
  * The delta therefore contains every doc whose census MAY have changed
  * (a doc whose batch-shared hash was already duplicated recomputes to
  * its unchanged row — harmless over-report, never an omission), with
  * its CURRENT full row; on an append-only corpus census rows only
  * grow, so delta ∪ (prior census minus delta's doc_ids) is the full
  * census — the maintenance equation IncrementalExactSubstrSpec proves
  * against a from-scratch q245 recompute across ingest splits.
  */
object IncrementalExactSubstr {

  val L = 50

  /** Anchor-store rows for a (doc_id, text) frame: one row per stride-1
    * L-token window, two independent span hashes. Row-local, absolute. */
  def anchors(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), x => x =!= "").as("w"))
      .withColumn("nw", expr(s"greatest(size(w) - ${L - 1}, 0)"))
      .select(col("doc_id"), col("w"),
        explode(expr(
          "CASE WHEN nw > 0 THEN sequence(CAST(1 AS BIGINT), nw) ELSE array() END"))
          .as("i"))
      .withColumn("s", concat_ws(" ", slice(col("w"), col("i").cast("int"), lit(L))))
      .select(col("doc_id"), col("i"),
        xxhash64(col("s")).as("h1"),
        xxhash64(col("s"), lit(1L)).as("h2"))

  /** Create/overwrite the store from a base corpus. */
  def materialize(docs: DataFrame, storePath: String): Unit =
    anchors(docs).withColumn("ingest", lit(0L))
      .write.mode("overwrite").partitionBy("ingest").parquet(storePath)

  /** Append one ingest batch's anchors (idempotent per ingest id: a
    * retry overwrites only its own partition — the IncrementalDedup
    * contract, including the schema note there on why the partition
    * value is not duplicated into the data files). */
  def append(docs: DataFrame, storePath: String, ingestId: Long): Unit = {
    require(ingestId > 0, "ingest 0 is the materialized base")
    anchors(docs)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest=$ingestId")
  }

  /** Current census rows (q245's schema) for every document whose
    * removal plan may have changed when `newDocs` joins the corpus at
    * `storePath`. The batch's anchors must already be appended OR are
    * unioned in here — pass the batch BEFORE appending (the store is
    * read as history only). */
  def censusDelta(newDocs: DataFrame, storePath: String): DataFrame = {
    val spark = newDocs.sparkSession
    val aNew = graft.Graft.stagedCheckpoint(anchors(newDocs))
    val store = spark.read.parquet(storePath).drop("ingest")
    // only batch hashes can change status. Join strategy is left to the
    // planner DELIBERATELY: the batch hash set is batch-TOKEN-sized,
    // not model-sized, so a forced broadcast would collect a multi-GB
    // table on a heavy ingest drop — AQE broadcasts it when it is
    // genuinely small and falls back to a shuffled semi-join otherwise
    // (history shuffles once per probe, never a pair space; a
    // continuous heavy-ingest deployment buckets the store by h1 so
    // the probe co-locates instead).
    val newH = aNew.select(col("h1"), col("h2")).distinct()
    val touched = store.join(newH, Seq("h1", "h2"), "left_semi")
      .unionByName(aNew)
    val dupNow = touched.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select(col("h1"), col("h2"))
    val affected = graft.Graft.stagedCheckpoint(
      touched.join(broadcast(dupNow), Seq("h1", "h2"), "left_semi")
        .select(col("doc_id")).distinct())
    // full anchor sets of affected docs (history probed by doc key)
    val aAff = graft.Graft.stagedCheckpoint(
      store.join(broadcast(affected), Seq("doc_id"), "left_semi")
        .unionByName(aNew.join(broadcast(affected), Seq("doc_id"), "left_semi")))
    // duplication status of every hash an affected doc holds, counted
    // corpus-wide but pruned to that hash set (affected-doc-TOKEN-
    // sized — same planner-decided join strategy as newH above)
    val affH = aAff.select(col("h1"), col("h2")).distinct()
    val occ = store.join(affH, Seq("h1", "h2"), "left_semi")
      .unionByName(aNew.join(affH, Seq("h1", "h2"), "left_semi"))
    val dupAll = occ.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select(col("h1"), col("h2"))
    val ver = aAff.join(dupAll, Seq("h1", "h2"), "left_semi")
      .select(col("doc_id"), col("i"))
    // n_tokens from the store itself: anchors cover 1..n-L+1, so
    // n = max(i) + L - 1 (affected docs hold >= 1 anchor by definition)
    val nt = aAff.groupBy(col("doc_id"))
      .agg((max(col("i")) + (L - 1)).cast("bigint").as("n_tokens"))
    Dedup.removalRuns(ver, L)
      .join(nt, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
        col("n_runs"), col("longest_run"))
  }
}
