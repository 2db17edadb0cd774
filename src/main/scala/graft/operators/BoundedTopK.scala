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
