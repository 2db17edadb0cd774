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
  *  - Range: explode each interval to the fixed-width time buckets it
  *    covers, equi-join probes on their own bucket, re-filter exactly.
  *    Candidate fan-out is bounded by interval_len/bucket_len + 1 (= 2
  *    here), the join is a plain hash join — never a
  *    BroadcastNestedLoopJoin/CartesianProduct, which is what Spark
  *    would pick for a raw range predicate (PlanGuardSpec forbids both).
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

  /** The bucketed interval-count kernel shared by q105 and the soak:
    * `intervals` pre-projected to (id, s_us, e_us) half-open micro
    * ranges, `points` to (t_us), `bUs` the bucket width. Each interval
    * explodes to its covering buckets (fan-out bounded by
    * len/bucket + 1), points compute their single bucket scan-side,
    * and a hash equi-join on the bucket + exact re-filter feeds one
    * count per interval — left semantics (empty intervals count 0),
    * no dedup needed (a point's one bucket meets each covering
    * interval exactly once), never a nested loop. */
  def rangeCountKernel(intervals: DataFrame, points: DataFrame, bUs: Long): DataFrame = {
    val inc = intervals.select(col("id"), col("s_us"), col("e_us"))
      .withColumn("bucket", explode(sequence(
        expr(s"s_us DIV ${bUs}L"), expr(s"(e_us - 1) DIV ${bUs}L"))))
    val pts = points.select(col("t_us"), expr(s"t_us DIV ${bUs}L").as("bucket"))
    inc.join(pts,
        inc("bucket") === pts("bucket") &&
          col("t_us") >= col("s_us") && col("t_us") < col("e_us"),
        "left")
      .groupBy(col("id"))
      .agg(count(col("t_us")).as("n_points"))
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
        |cross space. Instead each interval is exploded to the 1-hour
        |time buckets it covers (at most interval/bucket + 1 = 2 rows —
        |bounded fan-out), clicks compute their single bucket scan-side,
        |and the join is a plain hash equi-join on the bucket followed by
        |the exact range re-filter. A click's one bucket meets each
        |covering interval exactly once, so no dedup is needed, and
        |count() ignores the NULL probes of empty windows, so the
        |left-join + single groupBy yields zero counts without a second
        |pass over the intervals. Scale: shuffle volume is (clicks +
        |2x intervals), a hot hour is one skewed bucket that AQE
        |skew-split handles; nothing is quadratic.""".stripMargin,
      """WITH inc AS (SELECT event_id AS incident_id, ts AS start_ts,
        |                    ts + INTERVAL 1 HOUR AS end_ts
        |             FROM events WHERE event_type = 'error'),
        |     c AS (SELECT event_id, ts FROM events WHERE event_type = 'click')
        |SELECT i.incident_id AS incident_id, count(c.event_id) AS n_clicks
        |FROM inc i LEFT JOIN c ON c.ts >= i.start_ts AND c.ts < i.end_ts
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val busUs = 3600L * 1000000L // 1-hour buckets == interval length
      val ev = Tables.events(s, dir)
      val inc = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("id"),
          unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts")) + busUs).as("e_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("t_us"))
      rangeCountKernel(inc, clicks, busUs)
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
