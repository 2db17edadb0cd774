package graft.operators

import graft.functions.Fns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state funnel / sequence-pattern matching (the
  * MATCH_RECOGNIZE-class workload behind q112): per key, the depth
  * reached in an ordered k-step pattern, matched as a SUBSEQUENCE of
  * the key's event history (other events may interleave).
  *
  * == Why not an Aggregator ==
  * The obvious "scalable" shape — a merge-order-independent
  * `Aggregator` with O(k) state — is IMPOSSIBLE for k >= 3, not just
  * hard. Proof sketch: for the pattern v<c<p, depth 3 holds iff some
  * c-event lies strictly between the global earliest v and the global
  * latest p, i.e. iff a c stabs the interval (min_v, max_p). In a
  * commutative aggregation the interval endpoints are unknown until
  * the final merge and can land anywhere, so a partial state must
  * answer interval-stabbing for an arbitrary future interval — which
  * requires retaining EVERY distinct c position (for any finite kept
  * set {c1..cn} an adversary picks an interval containing only a
  * discarded c). Bounded commutative state therefore cannot exist;
  * any Aggregator here either keeps the whole history (the q112
  * defect this file retires) or silently returns wrong depths under
  * Spark's arbitrary reduce/merge order.
  *
  * == The scalable design ==
  * Sorted-stream scan, the same shape q113's RANGE frame uses:
  * hash-repartition by key (ONE shuffle), sort within partitions by
  * (key, ts, event_id) — Spark's external sort spills to disk, so a
  * bot-grade key with 1e8+ events costs disk bandwidth, never memory
  * — then a single mapPartitions pass holding O(k) state per key: the
  * current match depth and the event count. A 100 TB history needs 16
  * bytes of state per in-flight key, and exactly one key is in flight
  * per task at a time.
  *
  * The greedy scan (advance on the first occurrence of the next step)
  * is exact: matching each step at its earliest possible position
  * dominates any other match, so greedy depth == max j such that
  * steps[0..j-1] is a subsequence — identical to the oracle's
  * `v.*c.*p`-style regex cascade over the ordered initials string.
  */
object Funnel {

  /** Greedy subsequence-prefix depth over an ORDERED event iterator.
    * O(1) per event, O(1) state. Also counts events as it goes. */
  def scan(steps: IndexedSeq[String], ordered: Iterator[String]): (Long, Int) = {
    var depth = 0
    var n = 0L
    val k = steps.length
    while (ordered.hasNext) {
      val c = ordered.next()
      if (depth < k && c == steps(depth)) depth += 1
      n += 1L
    }
    (n, depth)
  }

  /** Reference brute-force (test oracle only): build the full ordered
    * string, test pattern prefixes as regexes — the exact method the
    * unbounded q112 implementation used. */
  def bruteForceDepth(steps: IndexedSeq[String], orderedChars: Seq[String]): Int = {
    val s = orderedChars.mkString
    var d = steps.length
    while (d > 0 && !s.matches(".*" + steps.take(d).mkString(".*") + ".*")) d -= 1
    d
  }

  /** Per-key O(k) scan state shared by the batch kernel and the
    * streaming twin ([[graft.streaming.StreamFunnel]]): fed events in
    * (ts, event_id) order via `update`, answers `depth` at any point.
    * `save`/`load` round-trip the state through a Long vector so the
    * streaming state store can persist it between micro-batches. */
  sealed trait FunnelScan extends Serializable {
    def reset(): Unit
    def update(t: Long, c: String): Unit
    def depth: Int
    def save: Vector[Long]
    def load(v: Seq[Long]): Unit
  }

  /** Unwindowed greedy subsequence scan: state is ONE int (the depth).
    * Exact by the exchange argument in the object scaladoc. */
  final class GreedyScan(k: Int, advances: (String, Int) => Boolean) extends FunnelScan {
    private var d = 0
    def reset(): Unit = d = 0
    def update(t: Long, c: String): Unit = if (d < k && advances(c, d)) d += 1
    def depth: Int = d
    def save: Vector[Long] = Vector(d.toLong)
    def load(v: Seq[Long]): Unit = d = v.head.toInt
  }

  /** Conversion-window scan (the windowFunnel-class semantics): depth d
    * requires a chain e_1 < ... < e_d (in (ts, event_id) order, e_i
    * matching step i) whose events ALL lie within `windowUs` of the
    * chain's FIRST event. State is k anchor timestamps: a(i) = the max,
    * over chains of length i+1 inside the scanned prefix, of the
    * chain's first-event time (MinValue if none).
    *
    * Exactness: events arrive in scan order, so every stored chain's
    * last event precedes any new event — the ordering constraint is
    * free, and extending a depth-i chain with a new event at time t is
    * feasible iff t - anchor <= W. Feasibility depends on the anchor
    * alone and is monotone in it, so only the max anchor per depth
    * matters; the window constraint on INTERMEDIATE events holds
    * inductively because each extension re-checks it at append time and
    * times grow along the chain. Updates read the PRE-event anchors
    * (loop runs depth-descending), so one event can never serve two
    * consecutive steps of the same chain, matching the strict e_i <
    * e_{i+1} chain order. */
  final class AnchorScan(k: Int, windowUs: Long, advances: (String, Int) => Boolean)
      extends FunnelScan {
    require(windowUs >= 0, "windowUs must be non-negative")
    private val a = Array.fill(k)(Long.MinValue)
    def reset(): Unit = java.util.Arrays.fill(a, Long.MinValue)
    def update(t: Long, c: String): Unit = {
      var i = k - 1
      while (i >= 1) {
        if (a(i - 1) != Long.MinValue && a(i - 1) > a(i) && t - a(i - 1) <= windowUs &&
          advances(c, i)) a(i) = a(i - 1)
        i -= 1
      }
      if (t > a(0) && advances(c, 0)) a(0) = t
    }
    def depth: Int = {
      var i = k - 1
      while (i >= 0 && a(i) == Long.MinValue) i -= 1
      i + 1
    }
    def save: Vector[Long] = a.toVector
    def load(v: Seq[Long]): Unit = { var i = 0; v.foreach { x => a(i) = x; i += 1 } }
  }

  /** k-bit '0'/'1' row mask from arbitrary step predicates: computed
    * scan-side by codegen'd CASE expressions, so the shuffle (and the
    * streaming state store) carry k bytes per row, never the predicate
    * inputs. */
  def stepMask(steps: Seq[Column]): Column =
    concat(steps.map(p => when(p, lit("1")).otherwise(lit("0"))): _*)

  /** Shared sorted-scan runner: `marker` is a per-row column computed
    * SCAN-SIDE (codegen, before the shuffle); `newScan` builds the
    * O(k) per-key state machine fed (t, marker) in total order. */
  private def run(events: DataFrame, marker: Column)(newScan: () => FunnelScan): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        epochUs(col("ts")).as("t"), // micros, not cast-to-seconds: ties break on id
        col("event_id").as("id"),
        marker.as("c"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("t"), col("id"))
      .as[(Long, Long, Long, String)]
      .mapPartitions { iter =>
        // stream the sorted partition: a key's rows are contiguous, so
        // the in-flight state is (count, scan state) — never a history
        val scan = newScan()
        new Iterator[(Long, Long, Int)] {
          private var curUser = 0L
          private var n = 0L
          private var open = false
          private var pending: (Long, Long, Int) = _
          private def advance(): Unit = {
            while (pending == null && iter.hasNext) {
              val (u, t, _, c) = iter.next()
              if (open && u != curUser) { pending = (curUser, n, scan.depth); n = 0L; scan.reset() }
              curUser = u; open = true
              scan.update(t, c)
              n += 1L
            }
            if (pending == null && !iter.hasNext && open) { pending = (curUser, n, scan.depth); open = false }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): (Long, Long, Int) = { advance(); val r = pending; pending = null; r }
        }
      }
      .toDF("user_id", "n_events", "funnel_depth")
  }

  /** Funnel depth per user over an events frame with (user_id, ts,
    * event_id, event_type): one shuffle, spill-safe local sort, O(k)
    * state. `steps` are event_type initials in funnel order. */
  def funnelDepth(events: DataFrame, steps: Seq[String]): DataFrame = {
    val stepsArr = steps.toIndexedSeq
    run(events, coalesce(substring(col("event_type"), 1, 1), lit("")))(
      () => new GreedyScan(stepsArr.length, (c, depth) => c == stepsArr(depth)))
  }

  /** The MATCH_RECOGNIZE DEFINE surface: each step is an ARBITRARY
    * boolean Column over the event row (predicates may overlap — one
    * row can satisfy several steps). Scan-side, each row collapses to
    * a k-bit '0'/'1' mask string ([[stepMask]]); the sorted scan then
    * advances on mask(depth). Same exchange argument as the initials
    * kernel: greedy earliest matching is exact for subsequence-prefix
    * depth. */
  def funnelDepthPredicates(events: DataFrame, steps: Seq[Column]): DataFrame = {
    val k = steps.length
    run(events, stepMask(steps))(
      () => new GreedyScan(k, (m, depth) => m.charAt(depth) == '1'))
  }

  /** Conversion-window funnel (q123, the windowFunnel-class semantics):
    * depth counts the longest step chain whose events all fall within
    * `windowUs` of the chain's first event. Same single-shuffle sorted
    * scan; per-key state grows from one int to k anchor timestamps
    * ([[AnchorScan]]) — still O(k), still spill-safe. */
  def funnelDepthWindowed(events: DataFrame, steps: Seq[Column], windowUs: Long): DataFrame = {
    val k = steps.length
    run(events, stepMask(steps))(
      () => new AnchorScan(k, windowUs, (m, depth) => m.charAt(depth) == '1'))
  }
}
