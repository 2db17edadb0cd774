package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental near-dup detection against a durable signature store —
  * the shape a 100 TB ingestion pipeline actually runs: the corpus was
  * deduped once; every new drop must be checked against ALL history
  * without recomputing (or even rescanning) history.
  *
  * The store holds one row per document: the 8-column MinHash signature
  * plus the 4 LSH band keys (all row-local, md5-based, ABSOLUTE — a
  * doc's signature never depends on the rest of the corpus, which is
  * the property that makes the batch and incremental paths provably
  * identical, see IncrementalDedupSpec).
  *
  * Matching a new batch:
  *   1. signatures of the new docs only (one pass over the new text);
  *   2. band-key equi-joins against the store — the store side is a
  *      columnar scan of (doc_id, bk*) with the join key pushed into a
  *      broadcast of the SMALL new side, so history is read once and
  *      never shuffled;
  *   3. candidate pairs verified by signature agreement (matching
  *      minhash components / 8 — the standard estimator of Jaccard
  *      from stored signatures; exact shingle Jaccard would require
  *      storing the corpus text itself).
  *
  * Appending the accepted batch's signatures keeps the store current;
  * each ingest lands in its own `ingest=<id>` partition, so a retried
  * batch overwrites its own subtree (same idempotency contract as the
  * K3 streaming sink).
  */
object IncrementalDedup {

  /** Signature-store rows for a (doc_id, text) frame. */
  def signatures(docs: DataFrame): DataFrame =
    Dedup.withBandKeys(Dedup.signatureWideOf(docs))

  /** Create/overwrite the store from a base corpus. */
  def materialize(docs: DataFrame, storePath: String): Unit =
    signatures(docs).withColumn("ingest", lit(0L))
      .write.mode("overwrite").partitionBy("ingest").parquet(storePath)

  /** Append one ingest batch's signatures (idempotent per ingest id:
    * a retry overwrites only its own partition). */
  def append(docs: DataFrame, storePath: String, ingestId: Long): Unit = {
    require(ingestId > 0, "ingest 0 is the materialized base")
    // The ingest=<id> directory already carries the value as a partition
    // column; writing it into the data files too would make appended
    // files' schemas diverge from the materialized base (which strips it
    // via partitionBy) and leave reads at the mercy of which footer gets
    // sampled for schema inference.
    signatures(docs)
      .write.mode("overwrite")
      .parquet(s"$storePath/ingest=$ingestId")
  }

  /** Near-dups of `newDocs` against the store (and within the batch):
    * (doc_id, dup_of, agreement) where dup_of is the smallest matching
    * doc and agreement the count of matching signature components
    * (>= `minAgree` of Dedup.NumSeeds). Band-bucket candidates only —
    * never an all-pairs comparison. */
  def matchNew(newDocs: DataFrame, storePath: String, minAgree: Int = 4): DataFrame = {
    val spark = newDocs.sparkSession
    val newSig = signatures(newDocs)
    val store = spark.read.parquet(storePath).drop("ingest")
      .unionByName(newSig) // batch-internal dups count too
    candidatePairs(newSig, store, minAgree)
  }

  /** Shared matcher: candidates of `probe` against `base` by any shared
    * band key (probe side broadcast — it is the small new batch), then
    * signature-agreement verify. Pairs are (probe.doc_id, base.doc_id)
    * with base.doc_id < probe.doc_id so a doc never matches itself and
    * the batch-internal ordering matches the batch path's `<`. */
  private[graft] def candidatePairs(
      probe: DataFrame, base: DataFrame, minAgree: Int): DataFrame = {
    val p = probe.select(
      col("doc_id").as("p_id") +:
        (0 until Dedup.NumSeeds).map(i => col(s"mh$i").as(s"p_mh$i")) ++:
        (0 until Dedup.NumBands).map(b => col(s"bk$b").as(s"p_bk$b")): _*)
    val bandMatch = (0 until Dedup.NumBands)
      .map(b => col(s"bk$b") === col(s"p_bk$b")).reduce(_ || _)
    val agree = (0 until Dedup.NumSeeds)
      .map(i => when(col(s"mh$i") === col(s"p_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    base.join(broadcast(p), bandMatch && col("doc_id") < col("p_id"))
      .select(col("p_id").as("doc_id"), col("doc_id").as("dup_of_cand"),
        agree.cast("int").as("agreement"))
      .filter(col("agreement") >= minAgree)
      .groupBy(col("doc_id"))
      // One struct-min keeps the pair consistent: the reported agreement
      // is the agreement WITH the reported dup_of partner, not the max
      // over all partners (min/max aggregated independently could mix two
      // different candidates into one output row).
      .agg(min(struct(col("dup_of_cand"), col("agreement"))).as("s"))
      .select(col("doc_id"), col("s.dup_of_cand").as("dup_of"),
        col("s.agreement").as("agreement"))
  }
}
