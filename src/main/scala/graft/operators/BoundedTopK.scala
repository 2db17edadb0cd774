package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored element flowing into [[BoundedTopK]]: `c` the score
  * (count), `k` the key — ordered by (c desc, k asc), a TOTAL order, so
  * the top-k set is unique and cross-engine reproducible. */
final case class Scored(c: Long, k: Long)

/** Aggregation buffer/result: top elements, kept sorted best-first. A
  * case-class wrapper (not a bare Seq) so the public
  * `Encoders.product` derivation applies. */
final case class TopKBuf(xs: Seq[Scored])

/** Bounded-memory per-group top-k as a typed [[Aggregator]].
  *
  * The window-rank formulation of top-k (q8/q20) shuffles and SORTS the
  * full group — at 100 TB a hot group sorts billions of rows to keep 3.
  * This aggregator keeps a k-bounded sorted buffer instead: `reduce`
  * rejects rows worse than the current k-th in O(1), `merge` combines
  * two buffers keeping k, and Spark's partial aggregation runs both
  * map-side — each task ships at most k rows per group into the
  * shuffle, and no group is ever fully sorted. Memory is O(k) per group
  * regardless of group cardinality.
  *
  * `merge` is commutative/associative and `reduce` order-independent
  * (proved in BoundedTopKSpec under shuffled inputs), so the result is
  * identical for any partitioning — the same invariant
  * BotStatsAggregator pins for its fused stats.
  */
final class BoundedTopK(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  require(k > 0, s"k must be positive, got $k")

  private def best(a: Scored, b: Scored): Boolean =
    a.c > b.c || (a.c == b.c && a.k < b.k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf =
    if (b.xs.size < k) TopKBuf((b.xs :+ a).sortWith(best))
    else if (best(a, b.xs.last)) TopKBuf((b.xs.init :+ a).sortWith(best))
    else b

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf((x.xs ++ y.xs).sortWith(best).take(k))

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Double-scored element for [[BoundedTopKD]]: `s` the score (e.g. a
  * cosine similarity), `k` the key — ordered by (s desc, k asc), a
  * TOTAL order as long as `s` is never NaN (scores here are finite
  * similarities; NaN would break the strict-weak-order contract). */
final case class ScoredD(s: Double, k: Long)

final case class TopKBufD(xs: Seq[ScoredD])

/** [[BoundedTopK]] for double-valued scores — same bounded-buffer
  * semantics and the same map-side partial-aggregation scale argument,
  * used by the ANN paths (q32/q34) where the per-group sort cost of a
  * `Window.partitionBy(query_id)` would cap parallelism at #queries:
  * 10 queries → 10 tasks, each sorting its query's whole scored corpus.
  * With the aggregator, scoring parallelism stays at #partitions and
  * each task ships at most k rows per query into the shuffle. Position
  * in the sorted buffer is row_number ≡ rank (total order). */
final class BoundedTopKD(k: Int) extends Aggregator[ScoredD, TopKBufD, TopKBufD] {
  require(k > 0, s"k must be positive, got $k")

  private def best(a: ScoredD, b: ScoredD): Boolean =
    a.s > b.s || (a.s == b.s && a.k < b.k)

  override def zero: TopKBufD = TopKBufD(Vector.empty)

  override def reduce(b: TopKBufD, a: ScoredD): TopKBufD =
    if (b.xs.size < k) TopKBufD((b.xs :+ a).sortWith(best))
    else if (best(a, b.xs.last)) TopKBufD((b.xs.init :+ a).sortWith(best))
    else b

  override def merge(x: TopKBufD, y: TopKBufD): TopKBufD =
    TopKBufD((x.xs ++ y.xs).sortWith(best).take(k))

  override def finish(r: TopKBufD): TopKBufD = r

  override def bufferEncoder: Encoder[TopKBufD] = Encoders.product[TopKBufD]
  override def outputEncoder: Encoder[TopKBufD] = Encoders.product[TopKBufD]
}
