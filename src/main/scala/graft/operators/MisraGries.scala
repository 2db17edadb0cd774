package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a mergeable typed Aggregator.
  *
  * Capacity-m summary of a key stream with the classic guarantees
  * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS'12):
  *
  *   - state is at most m (key, count) pairs, whatever the input size;
  *   - every key with true frequency > n/(m+1) is PRESENT in the
  *     summary after any sequence of reduces and merges (the
  *     completeness guarantee q86 builds on);
  *   - stored counts undercount by at most n/(m+1).
  *
  * `reduce` is the textbook step (increment | insert | decrement-all);
  * `merge` sums counters pointwise, then if more than m survive,
  * subtracts the (m+1)-th largest count from every counter and drops
  * the non-positive ones. Each partial aggregation task therefore
  * carries O(m) state — this is the candidate-discovery pass that lets
  * a heavy-hitter query avoid a full groupBy over billions of distinct
  * keys; an exact counting pass over the <= m candidates follows.
  *
  * The summary CONTENTS beyond the guarantee depend on input order, so
  * q86 never emits raw MG counts — only the exact-verified survivors —
  * keeping the query deterministic and oracle-comparable.
  */
final class MisraGries(m: Int) extends Aggregator[Long, TopKBuf, TopKBuf] {
  require(m > 0, s"capacity must be positive, got $m")

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, key: Long): TopKBuf = {
    val i = b.xs.indexWhere(_.k == key)
    if (i >= 0)
      TopKBuf(b.xs.updated(i, Scored(b.xs(i).c + 1, key)))
    else if (b.xs.size < m)
      TopKBuf(b.xs :+ Scored(1L, key))
    else
      TopKBuf(b.xs.map(s => Scored(s.c - 1, s.k)).filter(_.c > 0))
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    val combined = (x.xs ++ y.xs)
      .groupBy(_.k).map { case (k, ss) => Scored(ss.map(_.c).sum, k) }
      .toVector
    if (combined.size <= m) TopKBuf(combined)
    else {
      val sorted = combined.sortBy(s => (-s.c, s.k))
      val pivot = sorted(m).c
      TopKBuf(sorted.take(m).map(s => Scored(s.c - pivot, s.k)).filter(_.c > 0))
    }
  }

  override def finish(r: TopKBuf): TopKBuf = r

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
