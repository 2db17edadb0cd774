package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of the batch
  * fingerprint dedup tier (q26 exact / q95 chunk): an ingest pipeline
  * dropping re-crawled or re-delivered documents as they arrive, before
  * they reach storage.
  *
  * Built on `dropDuplicatesWithinWatermark`, which is the Spark-native
  * answer to the unbounded-state problem of streaming dedup:
  * `dropDuplicates` alone would keep every fingerprint ever seen (state
  * grows with corpus size — the 100 TB killer), while the
  * within-watermark variant evicts a fingerprint's state once the
  * watermark passes its event time + delay. The contract is therefore
  * TIME-BOUNDED exactness: any duplicate arriving within `delay` of the
  * first copy is dropped with certainty; a copy re-arriving after the
  * watermark has moved past the original may be re-admitted (its state
  * was reclaimed). That is the same bounded-state trade every streaming
  * stage in this engine makes (ST4 — StatefulDetect's TTL, the KV
  * sink's expiry), and the right one for ingest dedup: re-crawls
  * cluster in time, and the long-range tail is what the nightly batch
  * dedup (q26/q95) sweeps.
  *
  * The fingerprint is the same normalization the batch tier keys on:
  * lowercase, whitespace runs collapsed, then a 256-bit hash — so a
  * document admitted by the stream and one admitted by batch agree on
  * identity (stream ≡ batch proof in StreamDedupSpec).
  */
object StreamDedup {

  /** Content fingerprint: normalization-stable sha2. Row-local (usable
    * on both batch and streaming frames — the equivalence anchor). */
  def fingerprint(textCol: String): org.apache.spark.sql.Column =
    sha2(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), 256)

  /** Deduplicate a streaming document frame `(ts, doc_id, text, ...)`
    * on content fingerprint within the watermark horizon. Emits the
    * surviving rows plus their `fp`. */
  def dedup(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", fingerprint("text"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")
}
