package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Streaming twin of q217's shard-export manifest — the ONLINE half of
  * training-data export: as documents arrive, each closed hour emits
  * the per-shard ingest manifest (doc/byte/token tallies, the
  * order-invariant content checksum, first/last doc in shard order)
  * that an incremental exporter appends to its shard ledger. A
  * re-export audit sums the hourly checksums per shard and compares
  * against the batch manifest — bit-equality is the freshness proof.
  *
  * Shape: assignment, tokenization and checksum come from
  * `TrainingOps.shardColumns` — the EXACT scan-side projection batch
  * q217 plans (shared code, not a twin transcription) — so the whole
  * pipeline is covered by the stream ≡ batch replay proof. All state
  * is the watermarked tumbling-window census: at most 16 rows of six
  * counters per open hour, independent of traffic volume. Append
  * mode; ST3's late policy applies to stragglers.
  *
  * Because `withWatermark` is eliminated on batch inputs, this SAME
  * function is the batch kernel the replay spec compares against.
  */
object StreamShard {

  /** Per closed hour: (hour_start, shard, n_docs, n_bytes, n_tokens,
    * content_checksum, first_doc, last_doc) for a document stream with
    * columns (ts, doc_id, text, n_chars). */
  def hourlyManifest(docs: DataFrame, watermark: String = "30 minutes"): DataFrame =
    TrainingOps.shardColumns(docs.withWatermark("ts", watermark))
      .groupBy(window(col("ts"), "1 hour"), col("shard"))
      .agg(TrainingOps.shardManifestAggs.head, TrainingOps.shardManifestAggs.tail: _*)
      .select(unix_timestamp(col("window.start")).as("hour_start"),
        col("shard"), col("n_docs"), col("n_bytes"), col("n_tokens"),
        col("content_checksum"), col("first_doc"), col("last_doc"))
}
