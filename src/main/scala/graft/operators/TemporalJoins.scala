package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-in join strategies don't name:
  * the as-of join (each probe row matched to the latest build row at or
  * before its timestamp) and the interval/range join (rows matched to
  * every window that contains them). Both are staples of event-stream
  * analytics over the reference's views/reviews streams (reference
  * diagram.svg:3 "Aggregation and identification" stage consumes exactly
  * this attribution shape) and of feature backfills in training-data
  * pipelines.
  *
  * Neither is ported from anywhere: both are re-expressed as Spark
  * primitives whose physical plans scale.
  *
  *  - As-of: a tagged UNION + one keyed window (`last(_, ignoreNulls)`
  *    over rows-unbounded-preceding). ONE hash shuffle on the join key,
  *    no range lookup structure, no per-row binary search; a key's
  *    history sorts inside its own partition. This beats the
  *    join-then-rank formulation (which materializes every candidate
  *    pair — quadratic for hot keys) and matches DuckDB's native
  *    ASOF JOIN, which the oracle uses verbatim.
  *  - Range COUNT: one distributed prefix sum over the tagged
  *    points ∪ interval-endpoints union — n([s,e)) = F(e) − F(s) —
  *    never a BroadcastNestedLoopJoin/CartesianProduct (what Spark
  *    would pick for a raw range predicate; PlanGuardSpec forbids
  *    both), and never the pair-enumerating bucketed equi-join either
  *    (quadratic in per-bucket density — see rangeCountKernel).
  */
object TemporalJoins {

  /** The distributed as-of kernel shared by q104 and the soak: both
    * inputs pre-projected to (k: key, id: row id, t: event time as
    * BIGINT micros). Returns every probe row with the latest build row
    * at or before it per key (b_id/b_t, NULL when none) — left
    * semantics. Tagged UNION + one keyed window: build rows sort before
    * an equal-t probe (side 0 < 1), so "at or before" includes the
    * equal-timestamp build row, and the carried state is one value per
    * key — linear in the key's history, never a candidate pair space.
    * ONE hash shuffle on k. */
  def asofKernel(build: DataFrame, probe: DataFrame): DataFrame = {
    val cols = Seq("k", "id", "t")
    val tagged = build.select(cols.map(col): _*).withColumn("side", lit(0))
      .unionAll(probe.select(cols.map(col): _*).withColumn("side", lit(1)))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("b_id",
        last(when(col("side") === 0, col("id")), ignoreNulls = true).over(w))
      .withColumn("b_t",
        last(when(col("side") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("k"), col("id"), col("t"), col("b_id"), col("b_t"))
  }

  /** The interval point-COUNT kernel shared by q105 and the soak:
    * `intervals` pre-projected to (id, s_us, e_us) half-open micro
    * ranges, `points` to (t_us). A count never needs the pair space:
    * n_points([s, e)) = F(e) − F(s) with F(x) = #points strictly
    * before x, so the kernel evaluates F at the 2·|intervals| probe
    * positions with ONE distributed prefix sum
    * ([[DistributedRank.withGlobalPrefixSumDense]] over the dense
    * time axis — per-bucket windows, never partition-less) of the
    * tagged union points(weight 1) ∪ probes(weight 0). The doubled
    * ordinate (points at 2t, probes at 2x−1) sorts every probe
    * strictly before a same-instant point, making the RANGE-frame
    * cumulative exclusive (t < x, so the half-open [s, e) keeps its
    * t = s points and sheds its t = e ones); a final |intervals|-sized
    * groupBy folds each id's ±cum pair. Left semantics for free (both
    * probes always exist — an empty window folds to 0).
    *
    * This replaced the r7 bucketed explode-join (hash join on 1-hour
    * buckets + exact re-filter): that shape still ENUMERATED every
    * (interval, in-window point) pair to count it, and the pair mass
    * grows with the square of per-bucket density — the ×100 replica
    * (same wall-clock span, 100× rows on both sides) measured ×10⁴
    * pair work, 31 s at sf10 vs 3 s at sf3. The prefix-sum form
    * shuffles each input row exactly once, density-independent. */
  def rangeCountKernel(intervals: DataFrame, points: DataFrame): DataFrame = {
    val probes = intervals
      .select(col("id"), col("s_us").as("x"), lit(-1L).as("sign"))
      .unionAll(intervals
        .select(col("id"), col("e_us").as("x"), lit(1L).as("sign")))
      .select(col("id"), (col("x") * 2L - 1L).as("ord"), col("sign"),
        lit(0L).as("v"))
    val pts = points.select(lit(null).cast("long").as("id"),
      (col("t_us") * 2L).as("ord"), lit(0L).as("sign"), lit(1L).as("v"))
    DistributedRank.withGlobalPrefixSumDense(
        probes.unionAll(pts), col("ord"), col("v"), "cum", "tot")
      .filter(col("sign") =!= 0L)
      .groupBy(col("id"))
      .agg(sum(col("sign") * col("cum")).as("n_points"))
  }

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q104_asof_join",
      """As-of (last-tick) join: every purchase event attributed to the
        |same user's latest view event at or before the purchase
        |timestamp (left semantics: unmatched purchases survive with a
        |NULL view). Spark has no ASOF strategy; a naive
        |join-on-key-then-max materializes all (purchase x earlier-view)
        |pairs per user — quadratic for a hot user. This plan is linear:
        |tag both sides, UNION, and run last(view_id, ignoreNulls) over a
        |window PARTITIONED BY user ordered by (ts, side, event_id) —
        |views sort before an equal-timestamp purchase, so "at or before"
        |ties resolve like DuckDB's ASOF (p.ts >= v.ts). One hash shuffle
        |on user_id; per-user history sorts within its partition; state
        |is one carried value, not a candidate set. The oracle is
        |DuckDB's native ASOF LEFT JOIN. Data has no duplicate
        |(user_id, ts) pairs at any SF, so the match is unique and the
        |comparison deterministic.""".stripMargin,
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
        |SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
        |       v.event_id AS view_id, epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("event_id").as("id"), col("user_id").as("k"),
          unix_micros(col("ts")).as("t"), col("event_type"))
      asofKernel(
        build = e.filter(col("event_type") === "view"),
        probe = e.filter(col("event_type") === "purchase"))
        .select(
          col("id").as("purchase_id"),
          col("k").as("user_id"),
          timestamp_micros(col("t")).as("purchase_ts"),
          col("b_id").as("view_id"),
          (col("t") - col("b_t")).as("gap_us"))
    },

    // ----------------------------------------------------------------
    q("q105_range_join",
      """Interval (range) join: every error event opens a 1-hour incident
        |window; count the click events falling inside each window (zero
        |kept — left semantics). A raw `ON c.ts >= start AND c.ts < end`
        |join has no equi-key, so Spark plans a nested-loop over the full
        |cross space; and even a bucketed equi-join (this query's r7
        |shape) still ENUMERATES every (incident, in-window click) pair
        |to count it — pair mass grows with the SQUARE of per-hour
        |density, the quantity a 100-TB crawl maximizes (measured ×10⁴
        |at the ×100 replica: 31 s at sf10 vs 3 s at sf3). Counts don't
        |need pairs: n(s,e) = F(e) − F(s) with F(x) = clicks strictly
        |before x, evaluated for all 2·incidents probes at once by ONE
        |distributed prefix sum over the tagged click ∪ probe union
        |(rangeCountKernel — per-time-bucket windows, never
        |partition-less, probes sorted before same-instant clicks by the
        |doubled ordinate so F stays exclusive). Shuffle volume is
        |(clicks + 2·incidents) rows ONCE, density-independent; the
        |only per-key state is one running long.""".stripMargin,
      """WITH inc AS (SELECT event_id AS incident_id, ts AS start_ts,
        |                    ts + INTERVAL 1 HOUR AS end_ts
        |             FROM events WHERE event_type = 'error'),
        |     c AS (SELECT event_id, ts FROM events WHERE event_type = 'click')
        |SELECT i.incident_id AS incident_id, count(c.event_id) AS n_clicks
        |FROM inc i LEFT JOIN c ON c.ts >= i.start_ts AND c.ts < i.end_ts
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val busUs = 3600L * 1000000L // the 1-hour incident window
      val ev = Tables.events(s, dir)
      val inc = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) + busUs).as("e_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("t_us"))
      rangeCountKernel(inc, clicks)
        .select(col("id").as("incident_id"), col("n_points").as("n_clicks"))
    },

    // ----------------------------------------------------------------
    q("q190_asof_forward",
      """FORWARD as-of join with a match tolerance (the pandas
        |merge_asof(direction='forward', tolerance=...) semantics
        |q104's backward kernel doesn't cover): each purchase finds the
        |same user's EARLIEST view at or after it, and the match only
        |stands within 6 hours — post-purchase browse attribution.
        |Implementation is the SAME one-shuffle kernel by time
        |reflection: negate both sides' timestamps and run
        |[[asofKernel]] unchanged (latest −t ≤ −t_p ⇔ earliest
        |t ≥ t_p; the (t, side, id) tie order keeps the equal-time
        |view matched, exactly DuckDB's inclusive ≤). Tolerance is a
        |row-local CASE after the kernel — correct because the nearest
        |forward match is unique: if IT is out of tolerance, nothing
        |closer exists (left semantics survive: the row stays, columns
        |null).  The oracle is DuckDB's native forward ASOF LEFT JOIN
        |with the same post-filter.""".stripMargin,
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |     j AS (
        |  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
        |    p.ts AS purchase_ts, v.event_id AS view_id,
        |    epoch_us(v.ts) - epoch_us(p.ts) AS gap_us
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts)
        |SELECT purchase_id, user_id, purchase_ts,
        |  CASE WHEN gap_us <= 21600000000 THEN view_id END AS view_id,
        |  CASE WHEN gap_us <= 21600000000 THEN gap_us END AS gap_us
        |FROM j""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir)
        .select(col("event_id").as("id"), col("user_id").as("k"),
          unix_micros(col("ts")).as("t"), col("event_type"))
      asofKernel(
        build = e.filter(col("event_type") === "view")
          .withColumn("t", -col("t")),
        probe = e.filter(col("event_type") === "purchase")
          .withColumn("t", -col("t")))
        .select(
          col("id").as("purchase_id"),
          col("k").as("user_id"),
          timestamp_micros(-col("t")).as("purchase_ts"),
          col("b_id").as("view_id"),
          (col("t") - col("b_t")).as("gap_us"))
        .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
          when(col("gap_us") <= 21600000000L, col("view_id")).as("view_id"),
          when(col("gap_us") <= 21600000000L, col("gap_us")).as("gap_us"))
    })
}
