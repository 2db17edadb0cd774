package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming SEMANTIC deduplication — the ingest half of q205's
  * SemDeDup (Abbas et al. 2023) tier, completing the ingest-dedup story
  * beyond content fingerprints (StreamDedup catches re-crawls of the
  * same BYTES; this catches re-arrivals of the same MEANING —
  * paraphrases, near-verbatim rewrites — whose embeddings land in the
  * same semantic cell).
  *
  * Train-batch / serve-stream, like StreamBuckets' perplexity
  * boundaries and StreamCusum's μ: the codebook is batch-trained
  * ([[trainCodebook]], the exact first-k convention q205's session
  * cache uses), and every arriving embedding is assigned to its nearest
  * centroid SCAN-SIDE via the same integer sq_dist_long argmin
  * expression the batch tier runs — [[Similarity.ivExpr]] +
  * [[Similarity.cellAssignExpr]], shared VERBATIM, which is what makes
  * the stream ≡ batch proof a statement about one code path. The
  * codebook rides as a broadcast literal (k = Θ(√n) entries — the q205
  * size argument), so assignment adds no shuffle and no state.
  *
  * Dedup itself is `dropDuplicatesWithinWatermark` on the cell id: the
  * first arrival in a semantic cell is admitted, any same-cell arrival
  * within the watermark horizon is dropped, and a cell's state is
  * reclaimed once the watermark passes (time-bounded exactness — the
  * StreamDedup contract, at cell granularity). The cell IS the dedup
  * radius at ingest: coarser than q205's within-cell distance rank, by
  * design — ingest kills the flood, and the nightly batch q205 sweep
  * (the same assignment, exact distances) applies the fine rule to
  * what ingest admitted.
  */
object StreamSemDedup {

  /** One codebook entry: centroid id + quantized integer vector. A
    * case class (not a tuple) so the typedLit literal carries the
    * `cid`/`icv` field names [[Similarity.cellAssignExpr]] reads. */
  final case class Cent(cid: Long, icv: Seq[Long])

  /** Batch-train the codebook from an embeddings corpus — the exact
    * first-k centroid convention of q205's semAssign (k = max(8,
    * floor(sqrt n))), collected to the driver: k·dim longs, the model,
    * never the corpus (the StreamBuckets/StreamCusum trained-parameter
    * hand-off). */
  def trainCodebook(embeddings: DataFrame): Seq[Cent] = {
    val kk = embeddings.agg(
      greatest(lit(8L), floor(sqrt(count(lit(1)).cast("double"))).cast("long"))
        .as("k"))
    embeddings
      .select(col("vec_id"), expr(Similarity.ivExpr).as("iv"))
      .crossJoin(broadcast(kk))
      .filter(col("vec_id") < col("k"))
      .select(col("vec_id"), col("iv"))
      .collect()
      .map(r => Cent(r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_.cid)
  }

  /** Scan-side cell assignment: appends `cid` (assigned cell) and `cd`
    * (integer squared distance to it) to a frame carrying `embedding`.
    * Works identically on batch and streaming frames — the equivalence
    * anchor. Requires GraftFunctions registered on the session. */
  def assign(df: DataFrame, codebook: Seq[Cent]): DataFrame =
    df
      .withColumn("iv", expr(Similarity.ivExpr))
      .withColumn("cents", typedLit(codebook))
      .withColumn("m", expr(Similarity.cellAssignExpr))
      .withColumn("cid", col("m.cid"))
      .withColumn("cd", col("m.d"))
      .drop("iv", "cents", "m")

  /** Deduplicate a streaming embedding frame `(ts, vec_id, embedding,
    * ...)` semantically: one survivor per cell within the watermark
    * horizon (first arrival wins). */
  def dedup(stream: DataFrame, codebook: Seq[Cent],
      delay: String = "10 minutes"): DataFrame =
    assign(stream, codebook)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("cid")

  /** The nightly-sweep batch twin of [[dedup]] over the same horizon's
    * landed rows: the SAME assignment, then one survivor per cell —
    * the (ts, vec_id)-min row, a deterministic canonical pick. The
    * stream ≡ batch contract is exact at CELL granularity always (same
    * deduped cell set, one survivor each); the surviving ROW is also
    * identical whenever a cell's arrivals are processed in event-time
    * order, which is the replayed-ingest case the spec drives.
    * Under intra-batch disorder `dropDuplicatesWithinWatermark` keeps
    * the first row in PROCESSING order (late rows inside the horizon
    * are correctly deduped, but the admitted representative may be the
    * later-timestamped one) — which copy of a semantic duplicate
    * survives ingest is immaterial by definition, and the nightly
    * sweep's canonical pick supersedes it. The spec pins both tiers:
    * row-identity on in-order replay, cell-set identity under
    * disorder. */
  def batchSweep(docs: DataFrame, codebook: Seq[Cent]): DataFrame =
    assign(docs, codebook)
      .groupBy(col("cid"))
      .agg(min(struct(col("ts"), col("vec_id"))).as("f"))
      .select(col("cid"), col("f.ts").as("ts"), col("f.vec_id").as("vec_id"))
}
