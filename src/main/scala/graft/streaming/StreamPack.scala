package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TrainingOps
import graft.operators.TrainingOps.PackState

/** Streaming twin of q259's next-fit sequence packing — the ONLINE
  * half is not an adaptation here, it is the DEFINITION: next-fit is
  * the textbook online bin-packing algorithm (Johnson 1973 — each item
  * is placed as it arrives, only the current bin is ever open), so a
  * streaming packer that folds arrivals through the same recurrence is
  * the algorithm, and the batch tier is its replay over doc_id order.
  *
  * Shape: per-source keyed state is ONE [[TrainingOps.PackState]] —
  * five longs, shared VERBATIM with the batch kernel's sorted scan
  * (the recurrence lives in `PackState.step`, written once). Within a
  * micro-batch the group's rows are folded in doc_id order (the
  * loader draining its ingest queue in sequence); across batches the
  * fold continues from state, so feeding the corpus in doc_id order
  * reproduces batch q259's census EXACTLY — the stream ≡ batch spec
  * proves it and StreamPackSpec's incremental feed exercises the
  * state handoff. Update mode: every touched source re-emits its
  * running census row (a packing dashboard wants the current fill
  * ratio, not an append log).
  *
  * State never times out by design: total state is |sources| × 5
  * longs — bounded by the source catalog, not traffic — and expiring
  * a packer mid-stream would silently reset bin counts (a correctness
  * bug, not a leak). ST4's TTL discipline is for per-entity state
  * that grows with the key domain; this one doesn't.
  */
object StreamPack {

  final case class Doc(source: String, doc_id: Long, raw: Long)

  final case class PackRow(
      source: String, n_docs: Long, packed_tokens: Long, n_bins: Long,
      lb_bins: Long, fill_pm: Long, trunc_tokens: Long)

  /** Running per-source packing census for a document stream with
    * columns (source, doc_id, text); window `w` as in batch q259. */
  def census(docs: DataFrame, w: Long = 128L): Dataset[PackRow] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select(col("source"), col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("raw"))
      .as[Doc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[PackState, PackRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState.empty)
          // doc_id order within the batch: the queue drains in sequence
          it.toArray.sortBy(_.doc_id).foreach { d =>
            val l = math.min(d.raw, w)
            st = st.step(l, d.raw - l, w)
          }
          state.update(st)
          Iterator.single(PackRow(key, st.nDocs, st.packed, st.bins,
            (st.packed + w - 1L) / w,
            if (st.bins == 0L) 0L else 1000L * st.packed / (st.bins * w),
            st.trunc))
      }
  }
}
