package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2.10: the one custom aggregate the reference surface
  * motivates — a single-pass fusion of A1 (event count) and W3 (min
  * inter-arrival gap) per user, replacing a groupBy-count PLUS a
  * window-lag pass (two shuffles, one sort) with ONE typed aggregation
  * (one shuffle, no sort).
  *
  * The merge trick: a buffer keeps (count, minTs, maxTs, minGap) where
  * minGap is only the gap between *observed adjacent* events within a
  * partition-local run. Because partial buffers merge as
  * `min(gapA, gapB, bufferB.minTs - bufferA.maxTs)`, the cross-partition
  * boundary gap is accounted for — the result is exact for
  * time-contiguous partitions and a safe upper bound otherwise: it can
  * only overestimate the true min gap, never underestimate it, so a
  * "gap below threshold" verdict never produces a false positive.
  * (The exact per-event lag pass, ViewsPipeline.suspiciousByGap, remains
  * the reference implementation; at reference distributions both flag
  * the same users — see BotStatsAggregatorSpec.)
  *
  * Scale: input never sorts; partial aggregation combines map-side; the
  * hot bot keys reduce to one buffer per partition.
  */
object BotStatsAggregator {

  final case class Buf(n: Long, minUs: Long, maxUs: Long, minGapUs: Long, sumUs: Double)
  final case class BotStats(n: Long, spanUs: Long, minGapUsUpperBound: Long, ratePerHour: Double)

  /** Input: event time in epoch micros. */
  val agg: Aggregator[Long, Buf, BotStats] = new Aggregator[Long, Buf, BotStats] {
    override def zero: Buf = Buf(0L, Long.MaxValue, Long.MinValue, Long.MaxValue, 0.0)

    override def reduce(b: Buf, us: Long): Buf = {
      // events arrive unordered; treat the new point's distance to the
      // current [min,max] envelope as the observable adjacent gap
      val gap =
        if (b.n == 0) Long.MaxValue
        else if (us >= b.maxUs) us - b.maxUs
        else if (us <= b.minUs) b.minUs - us
        else Long.MaxValue // interior point: no adjacency info, skip
      Buf(b.n + 1, math.min(b.minUs, us), math.max(b.maxUs, us),
        math.min(b.minGapUs, gap), b.sumUs + us)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val boundary =
          if (b.minUs >= a.maxUs) b.minUs - a.maxUs
          else if (a.minUs >= b.maxUs) a.minUs - b.maxUs
          else Long.MaxValue // overlapping ranges: no safe adjacency
        Buf(a.n + b.n, math.min(a.minUs, b.minUs), math.max(a.maxUs, b.maxUs),
          math.min(math.min(a.minGapUs, b.minGapUs), boundary), a.sumUs + b.sumUs)
      }
    }

    override def finish(b: Buf): BotStats = {
      val span = if (b.n <= 1) 0L else b.maxUs - b.minUs
      val rate = if (span <= 0) b.n.toDouble else b.n.toDouble * 3600e6 / span
      BotStats(b.n, span, b.minGapUs, rate)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[BotStats] = Encoders.product[BotStats]
  }
}
