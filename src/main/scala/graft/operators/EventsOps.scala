package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the batch twins of
  * the reference's streaming stages (reference diagram.svg:3):
  * suspicious-actor detection (A1), inter-arrival signature (W3),
  * high-traffic windows (A4), popularity top-K (A2), partition-column
  * derivation (F5), JSON payload extraction.
  *
  * Time buckets are computed as epoch-second arithmetic (bigint), not
  * engine-specific window structs, so the DuckDB oracle is exact. In the
  * streaming twin the same groupBy runs under a watermark
  * (graft.streaming).
  */
object EventsOps {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q13_hourly_user_counts",
      """Per-user hourly event counts — the core of the reference's
        |suspicious-IP batch job (SURVEY.md A1, reference
        |generator.py:117-164). groupBy(user, hour_bucket): one shuffle,
        |partial counts combine map-side so a hot user (bot, 10x traffic)
        |costs one reducer a few extra merged rows, not a skewed
        |shuffle.""".stripMargin,
      """SELECT user_id,
        |  (epoch_us(ts) // 3600000000) * 3600 AS hour_start,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          bucketS(col("ts"), 3600).as("hour_start"))
        .agg(count(lit(1)).as("n_events"))
    },

    // ----------------------------------------------------------------
    q("q14_high_traffic_windows",
      """High-traffic alerting windows (SURVEY.md A4 → K5 notification
        |sink): total events per 6-hour tumbling window, keep windows over
        |threshold. Low-cardinality key → trivial shuffle.""".stripMargin,
      """SELECT (epoch_us(ts) // 21600000000) * 21600 AS win_start, count(*) AS n_events
        |FROM events
        |GROUP BY 1
        |HAVING count(*) > 8""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(bucketS(col("ts"), 21600).as("win_start"))
        .agg(count(lit(1)).as("n_events"))
        .filter(col("n_events") > 8)
    },

    // ----------------------------------------------------------------
    q("q15_interarrival_gaps",
      """Per-user inter-arrival signature (SURVEY.md W3: bots ~16ms gaps,
        |humans >=3.6s; reference generator.py:126,147-150). lag() over
        |(user, ts) — one shuffle+sort per user partition; min/avg gap in
        |exact integer microseconds.""".stripMargin,
      """WITH gaps AS (
        |  SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, count(gap_us) AS n_gaps,
        |  min(gap_us) AS min_gap_us,
        |  CAST(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) AS DOUBLE) AS avg_gap_us
        |FROM gaps
        |WHERE gap_us IS NOT NULL
        |GROUP BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("gap_us", epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(col("gap_us")).as("n_gaps"),
          min(col("gap_us")).as("min_gap_us"),
          (sum(col("gap_us")).cast("double") / count(col("gap_us"))).as("avg_gap_us"))
    },

    // ----------------------------------------------------------------
    q("q16_suspicious_users",
      """The suspicious-actor detector itself (SURVEY.md A1 + W3 fused):
        |flag users whose peak hourly rate exceeds a threshold OR whose
        |median-ish gap is bot-like. Output is the deny-set that feeds the
        |KV store (K4) and the anti-join filter (F1/J2).""".stripMargin,
      """WITH hourly AS (
        |  SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS h, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, max(c) AS peak_hourly, count(*) AS active_hours
        |FROM hourly
        |GROUP BY user_id
        |HAVING max(c) >= 3""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          bucketS(col("ts"), 3600).as("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(max(col("c")).as("peak_hourly"), count(lit(1)).as("active_hours"))
        .filter(col("peak_hourly") >= 3)
    },

    // ----------------------------------------------------------------
    q("q17_event_type_stats",
      """Per-type value stats (SURVEY.md A6): exact-decimal sum/avg,
        |raw min/max (comparison only — bit-stable).""".stripMargin,
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS DOUBLE) AS avg_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          davg(col("value")).as("avg_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    },

    // ----------------------------------------------------------------
    q("q18_partition_columns",
      """Partition-column derivation (SURVEY.md F5: year/month/day/hour
        |from ts — the Hive-style layout of the reference's hourly S3
        |drops, generator.py:244). At scale these become physical
        |partition keys for the curated zone write (K6).""".stripMargin,
      """SELECT CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |  CAST(day(ts) AS INT) AS d, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // ----------------------------------------------------------------
    q("q19_json_props",
      """Semi-structured payload extraction + NULL-sentinel normalization
        |(SURVEY.md F4, S6: OpenX-JsonSerDe-style schema-on-read). Pull
        |int k out of the JSON props column via regexp (engine-neutral),
        |treat 0 as the NULL sentinel, aggregate the nullable result —
        |count/avg must skip SQL NULLs identically.""".stripMargin,
      """WITH x AS (
        |  SELECT event_type,
        |    nullif(CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT), 0) AS k
        |  FROM events)
        |SELECT event_type, count(k) AS n_nonnull, count(*) AS n_rows,
        |  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k
        |FROM x GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k",
          nullif(regexp_extract(col("props"), "[0-9]+", 0).cast("bigint"), lit(0)))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_nonnull"),
          count(lit(1)).as("n_rows"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
    },

    // ----------------------------------------------------------------
    q("q20_popular_items_topk",
      """Most-popular-per-window top-K (SURVEY.md A2: the Kinesis
        |Analytics popularity stage): count events per (day, event_type),
        |rank within day, keep top 2. Two shuffles total (agg + window on
        |day); rank ties broken by name for determinism.""".stripMargin,
      """WITH counts AS (
        |  SELECT (epoch_us(ts) // 86400000000) * 86400 AS day_start, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT day_start, event_type, c, rk FROM (
        |  SELECT day_start, event_type, c,
        |    rank() OVER (PARTITION BY day_start ORDER BY c DESC, event_type) AS rk
        |  FROM counts)
        |WHERE rk <= 2""".stripMargin) { (s, dir) =>
      val counts = Tables.events(s, dir)
        .groupBy(bucketS(col("ts"), 86400).as("day_start"),
          col("event_type"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("day_start")).orderBy(col("c").desc, col("event_type"))
      counts.withColumn("rk", rank().over(w)).filter(col("rk") <= 2)
    },

    // ----------------------------------------------------------------
    q("q21_sessionize",
      """Sessionization via gap-threshold (lag + cumulative sum of
        |session-break markers): a new session starts after a >2h gap.
        |Classic two-window pattern — both windows share the same
        |(user_id, ts) partitioning+sort, so Spark plans ONE shuffle and
        |ONE sort. Output: per-session row counts and bounds in epoch
        |seconds.""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
        |         OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(epoch_us(ts) // 1000000) AS session_start_s,
        |  max(epoch_us(ts) // 1000000) AS session_end_s
        |FROM sessions
        |GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(byTs)
      Tables.events(s, dir)
        .withColumn("brk", when(gap > 7200000000L || gap.isNull, 1).otherwise(0))
        .withColumn("session_id", sum(col("brk")).over(
          byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(epochS(col("ts"))).as("session_start_s"),
          max(epochS(col("ts"))).as("session_end_s"))
    },

    // ----------------------------------------------------------------
    q("q112_funnel",
      """Funnel / sequence-pattern analysis (the MATCH_RECOGNIZE-class
        |workload): per user, how deep into the view → click → purchase
        |funnel did their ordered event history get, as a SUBSEQUENCE
        |match (other events may interleave). Runs on the bounded-state
        |kernel (operators/Funnel): ONE hash shuffle on user_id, a
        |spill-safe sortWithinPartitions on (user, ts, id), then a
        |single streaming scan holding (count, depth) — O(k) state per
        |in-flight key, so a bot-grade user with 1e8 events costs disk
        |sort bandwidth, never an in-memory history buffer (the
        |collect_list shape this kernel replaced). Funnel.scala's
        |scaladoc proves a merge-order-independent Aggregator cannot
        |exist for k>=3, which is why the kernel sorts. The oracle
        |rebuilds the ordered initials string with ORDER BY string_agg
        |and tests the same pattern prefixes as regexes.""".stripMargin,
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(s) AS BIGINT) AS n_events,
        |  CASE WHEN regexp_matches(s, 'v.*c.*p') THEN 3
        |       WHEN regexp_matches(s, 'v.*c') THEN 2
        |       WHEN regexp_matches(s, 'v') THEN 1
        |       ELSE 0 END AS funnel_depth
        |FROM seq""".stripMargin) { (s, dir) =>
      Funnel.funnelDepth(Tables.events(s, dir), Seq("v", "c", "p"))
    },

    // ----------------------------------------------------------------
    q("q121_funnel_4step",
      """The funnel kernel PARAMETERIZED (the MATCH_RECOGNIZE surface):
        |the same bounded-state secondary-sort scan as q112 but over the
        |four-step signup → view → click → purchase pattern — proving
        |the kernel's step list is genuinely general, not three
        |hard-coded branches. Identical scale shape: one hash shuffle,
        |spill-safe local sort, O(k) in-flight state. The oracle is the
        |same ordered-initials string with a four-deep regex
        |cascade.""".stripMargin,
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(s) AS BIGINT) AS n_events,
        |  CASE WHEN regexp_matches(s, 's.*v.*c.*p') THEN 4
        |       WHEN regexp_matches(s, 's.*v.*c') THEN 3
        |       WHEN regexp_matches(s, 's.*v') THEN 2
        |       WHEN regexp_matches(s, 's') THEN 1
        |       ELSE 0 END AS funnel_depth
        |FROM seq""".stripMargin) { (s, dir) =>
      Funnel.funnelDepth(Tables.events(s, dir), Seq("s", "v", "c", "p"))
    },

    // ----------------------------------------------------------------
    q("q122_funnel_predicates",
      """The MATCH_RECOGNIZE DEFINE surface: funnel steps as ARBITRARY
        |row predicates (view worth >= 10, then ANY click, then a
        |purchase >= 50) instead of event-type initials — predicates
        |may overlap, so a single per-row symbol can't encode them.
        |Scan-side each row collapses to a 3-bit '0'/'1' mask via
        |codegen'd CASE expressions (the shuffle carries 3 bytes per
        |row, never the predicate inputs); the same bounded secondary-
        |sort scan advances on mask(depth). The oracle rebuilds the
        |ordered mask string with string_agg and tests depth with
        |block-aligned anchored regexes (each row = one 3-char block;
        |depth d requires d blocks in order carrying a 1 at positions
        |0..d-1).""".stripMargin,
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(
        |      (CASE WHEN event_type = 'view' AND value >= 10.0 THEN '1' ELSE '0' END)
        |      || (CASE WHEN event_type = 'click' THEN '1' ELSE '0' END)
        |      || (CASE WHEN event_type = 'purchase' AND value >= 50.0 THEN '1' ELSE '0' END),
        |      '' ORDER BY ts, event_id) AS s,
        |    count(*) AS n
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CASE WHEN regexp_matches(s,
        |         '^([01]{3})*1[01][01]([01]{3})*[01]1[01]([01]{3})*[01][01]1') THEN 3
        |       WHEN regexp_matches(s, '^([01]{3})*1[01][01]([01]{3})*[01]1') THEN 2
        |       WHEN regexp_matches(s, '^([01]{3})*1') THEN 1
        |       ELSE 0 END AS funnel_depth
        |FROM seq""".stripMargin) { (s, dir) =>
      Funnel.funnelDepthPredicates(Tables.events(s, dir), Seq(
        col("event_type") === "view" && col("value") >= 10.0,
        col("event_type") === "click",
        col("event_type") === "purchase" && col("value") >= 50.0))
    },

    // ----------------------------------------------------------------
    q("q123_funnel_windowed",
      """Conversion-window funnel (the windowFunnel-class semantics):
        |per user, the longest view -> click -> purchase chain whose
        |events ALL fall within 12 hours of the chain's FIRST event.
        |The kernel keeps k anchor timestamps per key (max first-event
        |time of any chain reaching each depth) — a single sorted scan
        |is exact because stored chains always end before the incoming
        |event, so extension feasibility depends only on the anchor.
        |The oracle is fully independent: depth >= d is literally the
        |EXISTS-a-chain definition, a d-way self-join with the window
        |bound on the last element (intermediate bounds are implied by
        |time monotonicity along the chain). Events carry unique ts per
        |user, so the oracle's strict-ts chain order equals the
        |kernel's (ts, event_id) order.""".stripMargin,
      """WITH d AS (
        |  SELECT user_id, count(*) AS n,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS d1
        |  FROM events GROUP BY 1),
        |d2 AS (
        |  SELECT DISTINCT e1.user_id FROM events e1 JOIN events e2
        |    ON e2.user_id = e1.user_id AND e2.ts > e1.ts
        |   WHERE e1.event_type = 'view' AND e2.event_type = 'click'
        |     AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 43200000000),
        |d3 AS (
        |  SELECT DISTINCT e1.user_id FROM events e1
        |  JOIN events e2 ON e2.user_id = e1.user_id AND e2.ts > e1.ts
        |                AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 43200000000
        |  JOIN events e3 ON e3.user_id = e1.user_id AND e3.ts > e2.ts
        |                AND epoch_us(e3.ts) <= epoch_us(e1.ts) + 43200000000
        |   WHERE e1.event_type = 'view' AND e2.event_type = 'click'
        |     AND e3.event_type = 'purchase')
        |SELECT d.user_id, CAST(d.n AS BIGINT) AS n_events,
        |  CASE WHEN d3.user_id IS NOT NULL THEN 3
        |       WHEN d2.user_id IS NOT NULL THEN 2
        |       WHEN d.d1 = 1 THEN 1 ELSE 0 END AS funnel_depth
        |FROM d LEFT JOIN d2 USING(user_id) LEFT JOIN d3 USING(user_id)""".stripMargin) { (s, dir) =>
      Funnel.funnelDepthWindowed(Tables.events(s, dir), Seq(
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase"), 12L * 3600 * 1000000)
    },

    // ----------------------------------------------------------------
    q("q177_funnel_dropoff",
      """The funnel DROP-OFF report — q112's per-user depths rolled up
        |to the four numbers a product review actually reads: per depth
        |0..3, how many users topped out exactly there, how many
        |reached at least that far, and the step conversion permille
        |(reached(d) / reached(d-1), depth 0 pinned at 1000).  The
        |depth spine is generated explicitly so a depth nobody reached
        |still reports its zero (the q57 gap-fill discipline).  All
        |eight counts (exact-depth and reached-at-least per depth) ride
        |ONE scalar aggregate over the per-user depths, conversions
        |derive row-locally on that single row, and stack() unpivots it
        |to the four report rows — no window anywhere, not even a
        |constant-sized one (PlanGuard forbids partition-less windows
        |categorically, and the aggregate is the honest shape anyway).
        |Scale shape: the expensive part is exactly q112's one-shuffle
        |sorted-scan kernel; everything after is one row.""".stripMargin,
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id),
        |d AS (
        |  SELECT CASE WHEN regexp_matches(s, 'v.*c.*p') THEN 3
        |              WHEN regexp_matches(s, 'v.*c') THEN 2
        |              WHEN regexp_matches(s, 'v') THEN 1
        |              ELSE 0 END AS depth
        |  FROM seq),
        |hist AS (
        |  SELECT sp.depth, count(d.depth)::BIGINT AS n_at
        |  FROM (SELECT unnest(range(0, 4)) AS depth) sp
        |  LEFT JOIN d ON d.depth = sp.depth
        |  GROUP BY 1),
        |cum AS (
        |  SELECT depth, n_at,
        |    CAST(sum(n_at) OVER (ORDER BY depth DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_reached
        |  FROM hist)
        |SELECT depth, n_at, n_reached,
        |  CASE WHEN depth = 0 THEN 1000
        |       WHEN lag(n_reached) OVER (ORDER BY depth) = 0 THEN 0
        |       ELSE (1000 * n_reached) // lag(n_reached) OVER (ORDER BY depth)
        |  END AS step_conversion_permille
        |FROM cum""".stripMargin) { (s, dir) =>
      val d = Funnel.funnelDepth(Tables.events(s, dir), Seq("v", "c", "p"))
        .select(col("funnel_depth").cast("long").as("depth"))
      val aggs = (0 to 3).flatMap { k =>
        Seq(sum(when(col("depth") === k, 1L).otherwise(0L)).cast("long").as(s"at_$k"),
          sum(when(col("depth") >= k, 1L).otherwise(0L)).cast("long").as(s"reach_$k"))
      }
      d.agg(aggs.head, aggs.tail: _*)
        // Empty input makes the global aggregate emit one all-NULL row;
        // coalesce every sum to 0 so the stacked report matches the
        // oracle's explicit zero-filled depth spine.
        .selectExpr(
          Seq("at_0", "at_1", "at_2", "at_3",
            "reach_0", "reach_1", "reach_2", "reach_3")
            .map(c => s"coalesce($c, CAST(0 AS BIGINT)) AS $c"): _*)
        .selectExpr(
          (Seq("at_0", "at_1", "at_2", "at_3",
            "reach_0", "reach_1", "reach_2", "reach_3") ++
            (1 to 3).map(k =>
              s"""CASE WHEN reach_${k - 1} = 0 THEN CAST(0 AS BIGINT)
                 |ELSE (1000 * reach_$k) DIV reach_${k - 1} END AS conv_$k""".stripMargin)): _*)
        .selectExpr(
          """stack(4,
            |  CAST(0 AS BIGINT), at_0, reach_0, CAST(1000 AS BIGINT),
            |  CAST(1 AS BIGINT), at_1, reach_1, conv_1,
            |  CAST(2 AS BIGINT), at_2, reach_2, conv_2,
            |  CAST(3 AS BIGINT), at_3, reach_3, conv_3)
            |AS (depth, n_at, n_reached, step_conversion_permille)""".stripMargin)
    },

    // ----------------------------------------------------------------
    q("q178_value_mad",
      """Median absolute deviation — the robust dispersion statistic
        |paired with q170's winsorized location: per event type, the
        |exact median of cents (order statistic at rank ⌈n/2⌉) and the
        |exact median of |cents − median|, both by the q154/q170
        |histogram-inversion discipline.  Two passes over histograms,
        |zero passes sorting raw events: pass 1 builds the (type,
        |cents) histogram and inverts the cumulative count at ⌈n/2⌉;
        |pass 2 folds the SAME histogram (joined to its type's median)
        |into a deviation histogram — each bin's count transfers to
        ||cents − med| wholesale, so no event row is touched again —
        |and inverts that.  Window partitions stay domain-bounded
        |(≤ distinct cents values) at any data scale.  Every quantity
        |is an integer; both engines agree exactly.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |hist AS (SELECT event_type, cents, count(*)::BIGINT AS cnt
        |         FROM c GROUP BY 1, 2),
        |h2 AS (
        |  SELECT event_type, cents, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM hist),
        |med AS (
        |  SELECT event_type, max(n) AS n_events,
        |    min(CASE WHEN cum >= (n + 1) // 2 THEN cents END) AS median_cents
        |  FROM h2 GROUP BY 1),
        |dev AS (
        |  SELECT hist.event_type, abs(hist.cents - med.median_cents) AS d,
        |    CAST(sum(hist.cnt) AS BIGINT) AS cnt
        |  FROM hist JOIN med ON med.event_type = hist.event_type
        |  GROUP BY 1, 2),
        |d2 AS (
        |  SELECT event_type, d, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM dev)
        |SELECT med.event_type, med.n_events, med.median_cents,
        |  (SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN d END)
        |   FROM d2 WHERE d2.event_type = med.event_type) AS mad_cents
        |FROM med""".stripMargin) { (s, dir) =>
      val hist = Tables.events(s, dir)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("cnt"))
      val cum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("event_type"))
      val med = hist
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("cents"))).as("median_cents"))
      val dev = hist.join(med.select(col("event_type"), col("median_cents")), "event_type")
        .groupBy(col("event_type"),
          abs(col("cents") - col("median_cents")).as("d"))
        .agg(sum(col("cnt")).cast("long").as("cnt"))
      val cumD = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mad = dev
        .withColumn("cum", sum(col("cnt")).over(cumD).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("event_type"))
        .agg(min(when(expr("cum >= (n + 1) DIV 2"), col("d"))).as("mad_cents"))
      med.join(mad, "event_type")
        .select(col("event_type"), col("n_events"), col("median_cents"),
          col("mad_cents"))
    },

    // ----------------------------------------------------------------
    q("q179_session_lift",
      """Within-session event-type LIFT — the co-occurrence statistic
        |q150's Markov matrix doesn't capture (order-free association,
        |not adjacent transition): for every unordered type pair a < b,
        |how many sessions contain both, and the lift
        |P(ab) / (P(a)·P(b)) = n_ab·N / (n_a·n_b) carried exactly in
        |parts per million through DECIMAL(38) products (the q156
        |discipline — no floats, ranking-safe).  Sessions are q164's
        |>2h-gap rule; type presence dedups to distinct (session, type)
        |rows inside the session aggregate's partitioning, so the pair
        |self-join input is at most 5 rows per session and the pair
        |space collapses to |types|² totals with map-side combine.
        |Scale shape: one user-keyed shuffle to sessionize, one
        |session-keyed dedup riding it, a session-bounded self-join,
        |and broadcast scalar totals.""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
        |         OR lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, event_type,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked),
        |st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
        |tot AS (SELECT count(DISTINCT (user_id, session_id))::BIGINT AS n FROM st),
        |ta AS (SELECT event_type, count(*)::BIGINT AS n_t FROM st GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*)::BIGINT AS n_ab
        |  FROM st a JOIN st b
        |    ON a.user_id = b.user_id AND a.session_id = b.session_id
        |   AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
        |  CAST((CAST(p.n_ab AS HUGEINT) * tot.n * 1000000)
        |       // (CAST(ta.n_t AS HUGEINT) * tb.n_t) AS BIGINT) AS lift_ppm
        |FROM pairs p
        |JOIN ta ON ta.event_type = p.type_a
        |JOIN ta tb ON tb.event_type = p.type_b, tot""".stripMargin) { (s, dir) =>
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cumW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gap = epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(byTs)
      val st = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("brk", when(gap > 7200000000L || gap.isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(cumW).cast("long"))
        .select(col("user_id"), col("session_id"), col("event_type"))
        .distinct()
      val tot = st.select(col("user_id"), col("session_id")).distinct()
        .agg(count(lit(1)).as("n"))
      val ta = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      val pairs = st.as("a")
        .join(st.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.session_id") === col("b.session_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(ta.select(col("event_type").as("type_a"), col("n_t").as("n_a"))), "type_a")
        .join(broadcast(ta.select(col("event_type").as("type_b"), col("n_t").as("n_b"))), "type_b")
        .crossJoin(broadcast(tot))
        .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * n * 1000000)
                 |     DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""".stripMargin)
            .as("lift_ppm"))
    },

    // ----------------------------------------------------------------
    q("q186_interpolate_gaps",
      """LINEAR-interpolation gap fill — the imputation step q57's
        |zero-fill spine deliberately doesn't do: silent hours in each
        |event type's hourly count series get the straight line between
        |their neighboring OBSERVED hours, in integer milli-counts
        |(floor of 1000·(prev + (next−prev)·Δ/span)).  Formulated
        |engine-neutrally with no IGNORE-NULLS windows: one lead() over
        |the observed points pairs each segment's endpoints, and the
        |missing hours explode from the segment's index range carrying
        |both endpoints — so interpolation is pure row-local arithmetic.
        |Observed hours pass through at exact 1000·count, flagged 0.
        |Scale shape: the series is type-keyed (|types| partitions of
        ||hours| points — aggregate-sized, the q170 histogram argument);
        |the explode is bounded by gap width.  Sign note: next−prev may
        |be negative; the term is floored via the sign-symmetric split
        |the way q162 floors slopes, matching DuckDB's // exactly.""".stripMargin,
      """WITH obs AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |seg AS (
        |  SELECT event_type, h, cnt,
        |    lead(h) OVER (PARTITION BY event_type ORDER BY h) AS h2,
        |    lead(cnt) OVER (PARTITION BY event_type ORDER BY h) AS c2
        |  FROM obs),
        |gaps AS (
        |  SELECT event_type, unnest(range(h + 1, h2)) AS h,
        |    cnt, c2, h AS h1, h2
        |  FROM seg WHERE h2 IS NOT NULL AND h2 > h + 1),
        |interp AS (
        |  SELECT event_type, h,
        |    1000 * cnt + CASE WHEN c2 >= cnt
        |      THEN (1000 * (c2 - cnt) * (h - h1)) // (h2 - h1)
        |      ELSE -((1000 * (cnt - c2) * (h - h1)) // (h2 - h1))
        |    END AS milli, 1 AS interpolated
        |  FROM gaps)
        |SELECT event_type, CAST(h AS BIGINT) AS hour_bucket,
        |  CAST(milli AS BIGINT) AS count_milli,
        |  CAST(interpolated AS BIGINT) AS interpolated
        |FROM interp
        |UNION ALL
        |SELECT event_type, CAST(h AS BIGINT), 1000 * cnt, 0 FROM obs""".stripMargin) { (s, dir) =>
      val byH = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val obs = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).as("cnt"))
      val seg = obs
        .withColumn("h2", lead(col("h"), 1).over(byH))
        .withColumn("c2", lead(col("cnt"), 1).over(byH))
      val interp = seg
        .filter(col("h2").isNotNull && col("h2") > col("h") + 1)
        .select(col("event_type"), col("cnt"), col("c2"),
          col("h").as("h1"), col("h2"),
          explode(expr("sequence(h + 1, h2 - 1)")).as("h"))
        .select(col("event_type"), col("h").cast("long").as("hour_bucket"),
          (lit(1000L) * col("cnt") + expr(
            """CASE WHEN c2 >= cnt
              |THEN (1000 * (c2 - cnt) * (h - h1)) DIV (h2 - h1)
              |ELSE -((1000 * (cnt - c2) * (h - h1)) DIV (h2 - h1))
              |END""".stripMargin)).as("count_milli"),
          lit(1L).as("interpolated"))
      interp.unionAll(
        obs.select(col("event_type"), col("h").cast("long").as("hour_bucket"),
          (lit(1000L) * col("cnt")).as("count_milli"),
          lit(0L).as("interpolated")))
    },

    // ----------------------------------------------------------------
    q("q188_benford_audit",
      """Benford first-digit audit — the fraud/synthetic-data screen a
        |DQ tier (q175) runs on monetary columns: the observed first
        |significant digit distribution of event values against
        |Benford's law, with the expected permille carried as the
        |PUBLIC closed-form constants (log10(1+1/d) to 3 digits:
        |301..46 — fixed literals, so no engine computes a log) and
        |the per-digit deviation as an exact ppm-scale integer
        |(obs_permille − expected_permille)².  The first digit is pure
        |integer arithmetic on cents (divide by 10 until < 10 —
        |unrolled as 7 halvings since cents < 10^7), a scan-side
        |projection; the digit histogram is a 9-group aggregate with
        |map-side combine.  (This synthetic generator's values are
        |uniform, NOT Benford — the audit must say so, which the spec
        |pins.)""".stripMargin,
      """WITH c AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events),
        |fd AS (
        |  SELECT CASE
        |    WHEN v >= 1000000 THEN v // 1000000
        |    WHEN v >= 100000 THEN v // 100000
        |    WHEN v >= 10000 THEN v // 10000
        |    WHEN v >= 1000 THEN v // 1000
        |    WHEN v >= 100 THEN v // 100
        |    WHEN v >= 10 THEN v // 10
        |    ELSE v END AS d
        |  FROM c WHERE v > 0),
        |hist AS (SELECT d, count(*)::BIGINT AS n FROM fd GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM hist),
        |exp AS (
        |  SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97),
        |    (5, 79), (6, 67), (7, 58), (8, 51), (9, 46)) AS e(d, expected_permille))
        |SELECT exp.d AS digit, coalesce(hist.n, 0) AS n,
        |  (1000 * coalesce(hist.n, 0)) // tot.t AS obs_permille,
        |  CAST(exp.expected_permille AS BIGINT) AS expected_permille,
        |  ((1000 * coalesce(hist.n, 0)) // tot.t - exp.expected_permille)
        |    * ((1000 * coalesce(hist.n, 0)) // tot.t - exp.expected_permille)
        |    AS dev2
        |FROM exp LEFT JOIN hist ON hist.d = exp.d, tot""".stripMargin) { (s, dir) =>
      val expected = Seq(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L,
        5 -> 79L, 6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)
      import s.implicits._
      val exp = expected.toDF("digit", "expected_permille")
        .select(col("digit").cast("long").as("digit"),
          col("expected_permille"))
      val hist = Tables.events(s, dir)
        .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
        .filter(col("v") > 0)
        .select(expr(
          """CASE
            |WHEN v >= 1000000 THEN v DIV 1000000
            |WHEN v >= 100000 THEN v DIV 100000
            |WHEN v >= 10000 THEN v DIV 10000
            |WHEN v >= 1000 THEN v DIV 1000
            |WHEN v >= 100 THEN v DIV 100
            |WHEN v >= 10 THEN v DIV 10
            |ELSE v END""".stripMargin).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n"))
      val tot = hist.agg(sum(col("n")).cast("long").as("t"))
      exp
        .join(broadcast(hist), col("d") === col("digit"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("(1000 * n) DIV t").as("obs_permille"),
          col("expected_permille").cast("long").as("expected_permille"),
          expr("""((1000 * n) DIV t - expected_permille)
                 |* ((1000 * n) DIV t - expected_permille)""".stripMargin).as("dev2"))
    },

    // ----------------------------------------------------------------
    q("q191_linear_regression",
      """EXACT distributed multiple linear regression — cents modeled on
        |(days-since-launch, hour-of-day) with intercept, solved by the
        |normal equations + Cramer's rule entirely in integers: ONE
        |aggregation pass produces the nine moment sums (all inside
        |int64 at this schema's bounds), and the four 3×3 determinants
        |expand as textual polynomials evaluated in DECIMAL(38)/HUGEINT
        |— no matrix library, no floating solve, both engines
        |bit-identical (the q162 discipline lifted from 1 to k
        |features).  Coefficients emit as exact (numerator, shared
        |denominator) determinant pairs plus sign-symmetric
        |milli-fixed-point ratios.  Magnitude audit in-line: sums ≤
        |1.2e13, pairwise determinant terms ≤ 3e24, numerators with the
        |cents column ≤ ~1e29·10³ — inside 128-bit/DECIMAL(38) with
        |nine orders of headroom; at 10⁹ rows rescale t to weeks or
        |split the corpus, the ALGORITHM is unchanged.  Scale shape:
        |one scan, one scalar aggregate with map-side combine; the
        |solve is O(1) arithmetic on one row.""".stripMargin,
      """WITH a AS (SELECT min(ts) AS t0 FROM events),
        |c AS (
        |  SELECT
        |    (epoch_us(ts) - epoch_us(a.t0)) // 86400000000 AS t,
        |    (epoch_us(ts) % 86400000000) // 3600000000 AS h,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events, a),
        |m AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(h) AS BIGINT) AS sh,
        |    CAST(sum(t*t) AS BIGINT) AS stt, CAST(sum(t*h) AS BIGINT) AS sth,
        |    CAST(sum(h*h) AS BIGINT) AS shh,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(t*y) AS BIGINT) AS sty,
        |    CAST(sum(h*y) AS BIGINT) AS shy
        |  FROM c),
        |d AS (
        |  SELECT n,
        |    CAST(n AS HUGEINT) * (CAST(stt AS HUGEINT)*shh - CAST(sth AS HUGEINT)*sth)
        |      - CAST(st AS HUGEINT) * (CAST(st AS HUGEINT)*shh - CAST(sth AS HUGEINT)*sh)
        |      + CAST(sh AS HUGEINT) * (CAST(st AS HUGEINT)*sth - CAST(stt AS HUGEINT)*sh)
        |      AS den,
        |    CAST(sy AS HUGEINT) * (CAST(stt AS HUGEINT)*shh - CAST(sth AS HUGEINT)*sth)
        |      - CAST(st AS HUGEINT) * (CAST(sty AS HUGEINT)*shh - CAST(sth AS HUGEINT)*shy)
        |      + CAST(sh AS HUGEINT) * (CAST(sty AS HUGEINT)*sth - CAST(stt AS HUGEINT)*shy)
        |      AS d0,
        |    CAST(n AS HUGEINT) * (CAST(sty AS HUGEINT)*shh - CAST(shy AS HUGEINT)*sth)
        |      - CAST(sy AS HUGEINT) * (CAST(st AS HUGEINT)*shh - CAST(sh AS HUGEINT)*sth)
        |      + CAST(sh AS HUGEINT) * (CAST(st AS HUGEINT)*shy - CAST(sh AS HUGEINT)*sty)
        |      AS d1,
        |    CAST(n AS HUGEINT) * (CAST(stt AS HUGEINT)*shy - CAST(sth AS HUGEINT)*sty)
        |      - CAST(st AS HUGEINT) * (CAST(st AS HUGEINT)*shy - CAST(sh AS HUGEINT)*sty)
        |      + CAST(sy AS HUGEINT) * (CAST(st AS HUGEINT)*sth - CAST(sh AS HUGEINT)*stt)
        |      AS d2
        |  FROM m)
        |SELECT n, CAST(den AS VARCHAR) AS den_str,
        |  CAST(d0 AS VARCHAR) AS d0_str, CAST(d1 AS VARCHAR) AS d1_str,
        |  CAST(d2 AS VARCHAR) AS d2_str,
        |  CASE WHEN den = 0 THEN 0
        |       WHEN d0 >= 0 THEN CAST((1000 * d0) // den AS BIGINT)
        |       ELSE -CAST((1000 * -d0) // den AS BIGINT) END AS b0_millicents,
        |  CASE WHEN den = 0 THEN 0
        |       WHEN d1 >= 0 THEN CAST((1000 * d1) // den AS BIGINT)
        |       ELSE -CAST((1000 * -d1) // den AS BIGINT) END AS b1_millicents,
        |  CASE WHEN den = 0 THEN 0
        |       WHEN d2 >= 0 THEN CAST((1000 * d2) // den AS BIGINT)
        |       ELSE -CAST((1000 * -d2) // den AS BIGINT) END AS b2_millicents
        |FROM d""".stripMargin) { (s, dir) =>
      val anchor = Tables.events(s, dir).agg(min(col("ts")).as("t0"))
      val m = Tables.events(s, dir)
        .crossJoin(broadcast(anchor))
        .select(
          expr("(unix_micros(ts) - unix_micros(t0)) DIV 86400000000").as("t"),
          expr("(unix_micros(ts) % 86400000000) DIV 3600000000").as("h"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("y"))
        .agg(count(lit(1)).as("n"),
          sum(col("t")).cast("long").as("st"), sum(col("h")).cast("long").as("sh"),
          sum(col("t") * col("t")).cast("long").as("stt"),
          sum(col("t") * col("h")).cast("long").as("sth"),
          sum(col("h") * col("h")).cast("long").as("shh"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("t") * col("y")).cast("long").as("sty"),
          sum(col("h") * col("y")).cast("long").as("shy"))
      val D = "DECIMAL(38,0)"
      m.selectExpr("n",
          s"""CAST(n AS $D) * (CAST(stt AS $D)*shh - CAST(sth AS $D)*sth)
             |  - CAST(st AS $D) * (CAST(st AS $D)*shh - CAST(sth AS $D)*sh)
             |  + CAST(sh AS $D) * (CAST(st AS $D)*sth - CAST(stt AS $D)*sh) AS den""".stripMargin,
          s"""CAST(sy AS $D) * (CAST(stt AS $D)*shh - CAST(sth AS $D)*sth)
             |  - CAST(st AS $D) * (CAST(sty AS $D)*shh - CAST(sth AS $D)*shy)
             |  + CAST(sh AS $D) * (CAST(sty AS $D)*sth - CAST(stt AS $D)*shy) AS d0""".stripMargin,
          s"""CAST(n AS $D) * (CAST(sty AS $D)*shh - CAST(shy AS $D)*sth)
             |  - CAST(sy AS $D) * (CAST(st AS $D)*shh - CAST(sh AS $D)*sth)
             |  + CAST(sh AS $D) * (CAST(st AS $D)*shy - CAST(sh AS $D)*sty) AS d1""".stripMargin,
          s"""CAST(n AS $D) * (CAST(stt AS $D)*shy - CAST(sth AS $D)*sty)
             |  - CAST(st AS $D) * (CAST(st AS $D)*shy - CAST(sh AS $D)*sty)
             |  + CAST(sy AS $D) * (CAST(st AS $D)*sth - CAST(sh AS $D)*stt) AS d2""".stripMargin)
        .selectExpr("n",
          // decimal→string must not carry a scale suffix: DECIMAL(38,0)
          // renders bare digits in both engines
          "CAST(den AS STRING) AS den_str",
          "CAST(d0 AS STRING) AS d0_str", "CAST(d1 AS STRING) AS d1_str",
          "CAST(d2 AS STRING) AS d2_str",
          """CASE WHEN den = 0 THEN 0
            |     WHEN d0 >= 0 THEN CAST((1000 * d0) DIV den AS BIGINT)
            |     ELSE -CAST((1000 * -d0) DIV den AS BIGINT) END AS b0_millicents""".stripMargin,
          """CASE WHEN den = 0 THEN 0
            |     WHEN d1 >= 0 THEN CAST((1000 * d1) DIV den AS BIGINT)
            |     ELSE -CAST((1000 * -d1) DIV den AS BIGINT) END AS b1_millicents""".stripMargin,
          """CASE WHEN den = 0 THEN 0
            |     WHEN d2 >= 0 THEN CAST((1000 * d2) DIV den AS BIGINT)
            |     ELSE -CAST((1000 * -d2) DIV den AS BIGINT) END AS b2_millicents""".stripMargin)
    },

    // ----------------------------------------------------------------
    q("q194_lorenz_curve",
      """Lorenz-curve EXPORT — the distribution behind q157's scalar
        |Gini as the ten points an inequality dashboard plots: users
        |ranked by total spend into exact deciles (DistributedRank over
        |the (cents, user_id) total order — q192's scale shape, no
        |partition-less window), each decile reporting its user count,
        |its spend, and the CUMULATIVE user/spend shares in permille.
        |The cumulative step runs as a triangular self-join over the
        |TEN decile rows (the DistributedRank offset trick — bounded
        |pair space, no window even there), so the whole query is
        |window-free.  All shares are floor divisions of exact cents
        |sums; a perfectly equal population shows cum_spend ≈
        |cum_users, concentration bows the curve below the
        |diagonal.""".stripMargin,
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, user_id) AS rank,
        |    count(*) OVER () AS n
        |  FROM u),
        |d AS (
        |  SELECT ((rank - 1) * 10) // n AS decile,
        |    count(*)::BIGINT AS n_users, CAST(sum(cents) AS BIGINT) AS decile_cents
        |  FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS nu,
        |             CAST(sum(decile_cents) AS BIGINT) AS tc FROM d)
        |SELECT a.decile, a.n_users, a.decile_cents,
        |  (1000 * CAST(sum(b.n_users) AS BIGINT)) // t.nu AS cum_users_permille,
        |  (1000 * CAST(sum(b.decile_cents) AS BIGINT)) // t.tc AS cum_spend_permille
        |FROM d a JOIN d b ON b.decile <= a.decile, t
        |GROUP BY 1, 2, 3, t.nu, t.tc""".stripMargin) { (s, dir) =>
      val u = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("cents"))
      val d = DistributedRank.withGlobalRank(u,
          Seq(col("cents"), col("user_id")), "rank", "n")
        .select(expr("((rank - 1) * 10) DIV n").as("decile"), col("cents"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("cents")).cast("long").as("decile_cents"))
      val t = d.agg(sum(col("n_users")).cast("long").as("nu"),
        sum(col("decile_cents")).cast("long").as("tc"))
      d.as("a")
        .join(broadcast(d.as("b")), col("b.decile") <= col("a.decile"))
        .groupBy(col("a.decile").as("decile"),
          col("a.n_users").as("n_users"),
          col("a.decile_cents").as("decile_cents"))
        .agg(sum(col("b.n_users")).cast("long").as("cu"),
          sum(col("b.decile_cents")).cast("long").as("cc"))
        .crossJoin(broadcast(t))
        .select(col("decile"), col("n_users"), col("decile_cents"),
          expr("(1000 * cu) DIV nu").as("cum_users_permille"),
          expr("(1000 * cc) DIV tc").as("cum_spend_permille"))
    },

    // ----------------------------------------------------------------
    q("q195_user_profile_json",
      """Typed per-user PROFILE export — the feature-store handoff
        |shape: each user's event-type histogram serialized as a
        |canonical JSON object (keys sorted, no whitespace) next to
        |scalar features.  Exercises the nested-type construction
        |surface end to end — collect to array, sort_array for
        |DETERMINISTIC key order (a hash map's order would differ per
        |run, let alone per engine), map_from_entries, to_json —
        |against an oracle that builds the byte-identical string with
        |ordered string_agg: the hash match pins Spark's JSON
        |serialization format (no spaces, unquoted integers) exactly.
        |Scale shape: one user-keyed aggregate; the array is bounded by
        ||event types|.""".stripMargin,
      """WITH h AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |  '{' || string_agg('"' || event_type || '":' || c, ',' ORDER BY event_type)
        |      || '}' AS profile_json
        |FROM h GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).cast("long").as("n_events"),
          to_json(map_from_entries(sort_array(collect_list(
            struct(col("event_type"), col("c")))))).as("profile_json"))
    },

    // ----------------------------------------------------------------
    q("q199_audience_churn",
      """Hour-over-hour AUDIENCE CHURN — the engagement series behind
        |retention alerts: for each consecutive pair of active hours,
        |the exact Jaccard overlap of the two hours' distinct user
        |sets, in integer permille, plus the retained/new/lost
        |decomposition.  Shape: distinct (hour, user) pairs build in
        |one aggregate (map-side dedup); the self-join probes hour h's
        |users against hour h+1 ON THE USER KEY (equi-join,
        |user-partitioned — the hour shift rides the join condition,
        |never a cross of hour sets); retained counts collapse per
        |hour pair, and set sizes join back from the per-hour totals.
        |All counts exact, the Jaccard a floor division.""".stripMargin,
      """WITH hu AS (
        |  SELECT DISTINCT epoch_us(ts) // 3600000000 AS h, user_id
        |  FROM events),
        |sizes AS (SELECT h, count(*)::BIGINT AS n FROM hu GROUP BY 1),
        |ret AS (
        |  SELECT a.h AS h, count(*)::BIGINT AS retained
        |  FROM hu a JOIN hu b ON b.user_id = a.user_id AND b.h = a.h + 1
        |  GROUP BY 1)
        |SELECT s1.h AS hour_bucket, s1.n AS n_users, s2.n AS n_users_next,
        |  coalesce(ret.retained, 0) AS retained,
        |  s2.n - coalesce(ret.retained, 0) AS new_users,
        |  s1.n - coalesce(ret.retained, 0) AS lost_users,
        |  (1000 * coalesce(ret.retained, 0))
        |    // (s1.n + s2.n - coalesce(ret.retained, 0)) AS jaccard_permille
        |FROM sizes s1
        |JOIN sizes s2 ON s2.h = s1.h + 1
        |LEFT JOIN ret ON ret.h = s1.h""".stripMargin) { (s, dir) =>
      val hu = Tables.events(s, dir)
        .select(expr("unix_micros(ts) DIV 3600000000").as("h"), col("user_id"))
        .distinct()
      val sizes = hu.groupBy(col("h")).agg(count(lit(1)).as("n"))
      val ret = hu.as("a")
        .join(hu.as("b"),
          col("b.user_id") === col("a.user_id") && col("b.h") === col("a.h") + 1)
        .groupBy(col("a.h").as("h")).agg(count(lit(1)).as("retained"))
      sizes.as("s1")
        .join(sizes.as("s2"), col("s2.h") === col("s1.h") + 1)
        .join(ret.as("ret"), col("ret.h") === col("s1.h"), "left")
        .select(col("s1.h").as("hour_bucket"),
          col("s1.n").as("n_users"), col("s2.n").as("n_users_next"),
          coalesce(col("retained"), lit(0L)).as("retained"))
        .select(col("hour_bucket"), col("n_users"), col("n_users_next"),
          col("retained"),
          (col("n_users_next") - col("retained")).as("new_users"),
          (col("n_users") - col("retained")).as("lost_users"),
          expr("(1000 * retained) DIV (n_users + n_users_next - retained)")
            .as("jaccard_permille"))
    },

    // ----------------------------------------------------------------
    q("q189_behavior_diversity",
      """Behavioral diversity per user — the Gini-Simpson index
        |1 − Σpᵢ², the entropy-class metric with NO logarithm, so it
        |stays exact: simpson_ppm = (10⁶·(n² − Σcᵢ²)) DIV n² on the
        |per-user event-type histogram (0 = always the same action,
        |→ 10⁶·(k−1)/k = perfectly uniform over k types).  Bot
        |signature reading: the q172 cadence tier flags WHEN a user
        |acts; this flags WHAT — scripted accounts collapse to a few
        |actions.  One shuffle to the (user, type) histogram (≤ |types|
        |rows per user), then a user-keyed roll-up; Σcᵢ² ≤ n² ≤ 10¹²
        |on realistic per-user counts, and ×10⁶ runs through
        |DECIMAL(38) so even a 10⁸-event bot cannot overflow the
        |product.""".stripMargin,
      """WITH h AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    count(*)::BIGINT AS n_types,
        |    CAST(sum(c * c) AS BIGINT) AS sum_c2
        |  FROM h GROUP BY 1)
        |SELECT user_id, n, n_types,
        |  CAST((1000000 * (CAST(n AS HUGEINT) * n - sum_c2))
        |       // (CAST(n AS HUGEINT) * n) AS BIGINT) AS simpson_ppm
        |FROM g""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(sum(col("c")).cast("long").as("n"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).cast("long").as("sum_c2"))
        .select(col("user_id"), col("n"), col("n_types"),
          expr("""CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * n - sum_c2))
                 |     DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
            .as("simpson_ppm"))
    },

    // ----------------------------------------------------------------
    q("q113_rolling_window",
      """Time-based rolling aggregate (RANGE frame): per user, the
        |6-hour trailing sum of event value and event count at every
        |event — the moving-metric shape behind rate limiting and
        |rolling spend. The window is keyed (partition by user) and
        |RANGE-framed on epoch micros, so each partition streams its
        |sorted history once with two running accumulators — state is
        |the frame content, not the history. Money travels as exact
        |DECIMAL inside the frame sum and leaves as integer cents, so
        |the frame arithmetic is order-independent and bit-identical in
        |both engines (a raw double frame sum would depend on each
        |engine's accumulation order).""".stripMargin,
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w * 100 AS BIGINT) AS roll_cents,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochUs(col("ts")))
        .rangeBetween(-21600000000L, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (sum(col("value").cast("decimal(18,2)")).over(w) * 100)
            .cast("long").as("roll_cents"),
          count(lit(1)).over(w).cast("long").as("roll_n"))
    },

    // ----------------------------------------------------------------
    q("q114_salted_agg",
      """Skew-proof two-phase aggregation (operators/Skew.saltedCount):
        |per-user event counts where one hot key (a bot at 100x traffic)
        |would otherwise pin a single reducer — phase 1 spreads each key
        |over 16 salts, phase 2 merges the 16 partials per key. The
        |oracle is the PLAIN group-by: the whole point is that salting
        |is invisible in the result (count is algebraic, so the two-
        |phase merge is exact), and the hash compare proves it row for
        |row. The salt column derives from monotonically_increasing_id,
        |which is partitioning-dependent — but only the SPREAD depends
        |on it, never the merged totals, so the query is deterministic
        |where it must be. Cost: one extra (tiny, 16x-key) shuffle
        |bought for a 16x cut in worst-key reducer load at 100 TB.""".stripMargin,
      """SELECT user_id, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Skew.saltedCount(Tables.events(s, dir), col("user_id"))
        .select(col("k").as("user_id"), col("n"))
    },

    // ----------------------------------------------------------------
    q("q116_salted_join",
      """Skew-proof fact ⋈ dim equi-join (operators/Skew.saltedJoin) —
        |the more common production shape than q114's salted count:
        |events (fact, bot keys at 10-100x traffic) enriched with the
        |customer dimension on user_id = c_custkey. The fact side is
        |salted via pmod(monotonically_increasing_id, 16), the dim side
        |replicated across all 16 salts with explode(sequence(...)), so
        |the join key becomes (user_id, salt) and one hot user's rows
        |spread over 16 reducers instead of pinning one. Each fact row
        |still matches its dim row exactly once (the dim copy carrying
        |its salt), so — like q114 — the oracle is the PLAIN join: the
        |hash compare proves salting is invisible row for row.
        |SkewSpec additionally proves parity under a synthetic 100x hot
        |key. At 100 TB the dim replication cost is 16x a broadcast-
        |sized table; the payoff is no single reducer ever sees a whole
        |hot key.""".stripMargin,
      """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin) { (s, dir) =>
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
      Skew.saltedJoin(Tables.events(s, dir), dim, "user_id")
        .select(col("event_id"), col("user_id"), col("c_name"), col("c_mktsegment"))
    },

    // ----------------------------------------------------------------
    q("q126_retention_cohorts",
      """Cohort retention — the product-analytics staple: users are
        |cohorted by their FIRST active day, and each (cohort, day-offset)
        |cell counts how many of them were active again offset days
        |later (offset 0 = the cohort's size). One pass does everything:
        |groupBy(user) with min(day) + collect_set(day) — ONE data-wide
        |shuffle, and collect_set dedupes map-side, so what shuffles per
        |user is its distinct active-day set, not its event history.
        |The per-user state is bounded by the CALENDAR (days since
        |launch: 30 here, ~1000 for a 3-year log), not by event count —
        |the bot key with 1e8 events carries the same <= 30-element set
        |as anyone else, exactly the bound q112's funnel rebuild was
        |about. The exploded (cohort, offset) re-aggregation shuffles at
        |most users x horizon tiny rows. The oracle computes the same
        |matrix relationally (distinct days join first-day) in DuckDB.""".stripMargin,
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
        |SELECT c.cohort_day, CAST(d.day - c.cohort_day AS BIGINT) AS offset_days,
        |  count(*) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
        .select(col("cohort_day"), explode(col("days")).as("day"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ----------------------------------------------------------------
    q("q146_decayed_engagement",
      """Exponential time-decay scoring — the recency-weighting
        |primitive behind freshness-aware sampling and trending-user
        |selection: each event contributes 2^20 >> age_days (half-life
        |one day, capped at 20 doublings so the shift is defined), and
        |users rank by the decayed sum. The weight is an integer BIT
        |SHIFT, not exp()/pow() — bit-identical cross-engine where
        |float decay would drift, and monotone in recency exactly like
        |the real thing. The decay anchor is max(ts) over the data (a
        |single-row scalar aggregate broadcast back), so the score is a
        |pure function of the dataset — reproducible on any cluster at
        |any wall-clock time. Scale shape: anchor = one scalar agg;
        |weights are scan-side arithmetic; one user-keyed agg with
        |map-side combine; top-20 via TakeOrdered.""".stripMargin,
      """WITH a AS (SELECT max(ts) AS mx FROM events),
        |w AS (
        |  SELECT user_id,
        |    1048576 >> CAST(least((epoch_us(a.mx) - epoch_us(ts)) // 86400000000, 20) AS INT) AS wt
        |  FROM events, a)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(wt) AS BIGINT) AS decayed_score
        |FROM w GROUP BY user_id
        |ORDER BY decayed_score DESC, user_id LIMIT 20""".stripMargin) { (s, dir) =>
      val anchor = Tables.events(s, dir).agg(max(col("ts")).as("mx"))
      Tables.events(s, dir)
        .crossJoin(broadcast(anchor))
        .select(col("user_id"), expr(
          "shiftright(1048576L, CAST(least((unix_micros(mx) - unix_micros(ts)) DIV 86400000000, 20) AS INT))").as("wt"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("wt")).cast("bigint").as("decayed_score"))
        .orderBy(col("decayed_score").desc, col("user_id"))
        .limit(20)
    },

    // ----------------------------------------------------------------
    q("q148_active_streaks",
      """Gap-and-islands streak detection — the engagement metric q126's
        |retention matrix can't express: each user's LONGEST run of
        |consecutive active days (plus total active days). The classic
        |islands trick makes it one keyed window + two aggs: within a
        |user, day - row_number(day) is constant exactly along a
        |consecutive-day run, so grouping on that anchor yields run
        |lengths with no self-join and no per-day loop. Scale shape:
        |the distinct (user, day) projection dedupes map-side before
        |its shuffle (calendar-bounded like q126 — a 1e8-event bot
        |carries <= 30 day rows); the window is PARTITIONED by user
        |over those day rows only, never the event history; run
        |grouping and the final per-user fold are two tiny keyed aggs.
        |All-integer output, no ties anywhere (days are distinct within
        |a user), so the result is deterministic cross-engine.""".stripMargin,
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |        row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
        |g AS (SELECT user_id, day - CAST(rn AS INT) AS grp, count(*) AS len
        |      FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak
        |FROM g GROUP BY 1""".stripMargin) { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      d.withColumn("rn", row_number().over(w))
        .groupBy(col("user_id"), date_sub(col("day"), col("rn")).as("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).cast("long").as("n_active_days"),
          max(col("len")).cast("long").as("longest_streak"))
    },

    // ----------------------------------------------------------------
    q("q149_rolling_anomaly",
      """Rolling z-score anomaly detection — q113's trailing RANGE frame
        |put to its monitoring use: an event is anomalous when its value
        |sits more than 3 standard deviations from the mean of the
        |user's own PRIOR 6 hours (the frame EXCLUDES the event and its
        |timestamp peers — a spike must not get to dilute the variance
        |it is judged against; self-inclusive frames cap the reachable
        |z at sqrt(n-1), which is why monitoring systems baseline on
        |history), with at least 5 prior events so the variance is
        |meaningful. The test is INTEGER-EXACT: money enters as exact
        |cents, and |x - S/n| > 3*sigma is evaluated in the cleared
        |form dev2 = (n*x - S)^2 vs thr = 9*(n*Q - S^2) — no division,
        |no sqrt, no floats, so both engines decide every row
        |identically, and BOTH sides of the comparison are emitted at
        |full resolution (the hash gate then verifies the frame
        |arithmetic on every row, not just the rare flag). Bounds:
        |cents < 2^16 and frames are minutes-deep, so every product
        |stays far under 2^63. Scale shape: ONE keyed window (partition
        |by user, RANGE frame on epoch micros) computes all three
        |accumulators in a single streaming pass per partition — state
        |is the frame, not the history; the verdict is scan-side
        |arithmetic. streaming/StreamAnomaly is the streaming twin with
        |a stream ≡ batch proof over this exact function.""".stripMargin,
      """WITH c AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, cents,
        |    count(*) OVER win AS n,
        |    CAST(coalesce(sum(cents) OVER win, 0) AS BIGINT) AS s,
        |    CAST(coalesce(sum(cents * cents) OVER win, 0) AS BIGINT) AS q
        |  FROM c
        |  WINDOW win AS (PARTITION BY user_id ORDER BY t
        |                 RANGE BETWEEN 21600000000 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, CAST(n AS BIGINT) AS n_frame,
        |  (n * cents - s) * (n * cents - s) AS dev2,
        |  9 * (n * q - s * s) AS thr,
        |  CAST(n >= 5 AND
        |       (n * cents - s) * (n * cents - s) > 9 * (n * q - s * s) AS INT) AS anomaly
        |FROM w""".stripMargin) { (s, dir) =>
      rollingAnomaly(Tables.events(s, dir))
    },

    // ----------------------------------------------------------------
    q("q150_markov_transitions",
      """First-order Markov transition matrix over per-user event
        |sequences — the behavioral model BEHIND q112's funnels: for
        |every (prev_type → next_type) pair, the transition count and
        |its probability given the source state, in integer permille
        |(floor division — both engines agree exactly where a float
        |ratio could differ in the last bit). Ordering is total and
        |deterministic: (epoch micros, event_id) breaks timestamp ties
        |identically cross-engine. Scale shape: ONE user-keyed window
        |pass computes every lag (state = one previous row per
        |partition stream); the transition aggregate collapses the
        |corpus to |types|² rows with map-side combine; row totals come
        |from a second tiny agg on those ≤25 rows, joined back as a
        |BROADCAST — the corpus shuffles once, everything after is
        |type-cardinality-sized.""".stripMargin,
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |t AS (SELECT prev AS prev_type, event_type AS next_type, count(*) AS n
        |      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
        |      FROM t GROUP BY 1)
        |SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n_transitions,
        |  (1000 * t.n) // s.tot AS permille
        |FROM t JOIN s USING (prev_type)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochUs(col("ts")), col("event_id"))
      val t = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val tot = t.groupBy(col("prev_type"))
        .agg(sum(col("n")).cast("long").as("tot"))
      t.join(broadcast(tot), Seq("prev_type"))
        .select(col("prev_type"), col("next_type"),
          col("n").cast("long").as("n_transitions"),
          expr("(1000 * n) DIV tot").as("permille"))
    },

    // ----------------------------------------------------------------
    q("q157_gini_concentration",
      """Gini coefficient of event spend — the inequality/concentration
        |metric behind whale detection and revenue-risk reporting,
        |computed EXACTLY from the rank formulation
        |G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over the ascending total
        |order (cents, event_id). The global rank comes from
        |operators/DistributedRank (range shuffle + parallel local
        |sorts + broadcast partition offsets) — the suite's standing
        |answer to "global order without a partition-less window"; the
        |rank-weighted sum then folds in ONE aggregate with
        |DECIMAL(38,0) accumulation (rank × cents reaches ~1e19 at
        |1e9 rows — past int64, inside decimal — and decimal sums are
        |order-independent, so the result is bit-identical under any
        |partitioning). Output: one row, Gini in integer permille by
        |floor division, plus n and total cents.""".stripMargin,
      """WITH c AS (
        |  SELECT event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT cents,
        |        row_number() OVER (ORDER BY cents, event_id) AS rk FROM c),
        |a AS (SELECT count(*)::BIGINT AS n,
        |        CAST(sum(cents) AS BIGINT) AS total_cents,
        |        sum(CAST(rk AS HUGEINT) * cents) AS sxr FROM r)
        |SELECT n, total_cents,
        |  CAST((1000 * (2 * sxr - (CAST(n AS HUGEINT) + 1) * total_cents))
        |       // (CAST(n AS HUGEINT) * total_cents) AS BIGINT) AS gini_permille
        |FROM a""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .select(col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      DistributedRank.withGlobalRank(c, Seq(col("cents"), col("event_id")), "rk", "nTot")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("cents")).cast("long").as("total_cents"),
          sum(col("rk").cast("decimal(19,0)") * col("cents").cast("decimal(19,0)"))
            .cast("decimal(38,0)").as("sxr"))
        .select(col("n"), col("total_cents"),
          expr("""CAST((1000 * (2 * sxr - (CAST(n AS DECIMAL(19,0)) + 1) * total_cents))
                 |     DIV (CAST(n AS DECIMAL(19,0)) * total_cents) AS BIGINT)""".stripMargin)
            .as("gini_permille"))
    },

    // ----------------------------------------------------------------
    q("q159_path_trigrams",
      """Behavioral path mining — the discovery step BEFORE q112's
        |funnels (funnels evaluate a pattern someone already chose;
        |this finds the patterns worth evaluating): every CONTIGUOUS
        |3-step event-type path, counted by occurrences and by distinct
        |users traveling it, top-20 by support. No per-user history is
        |ever collected: two lag() steps over ONE user-keyed window
        |turn each event into its trailing trigram scan-side, so the
        |window state is two rows per partition stream and the
        |aggregate collapses the corpus to |types|³ rows max with
        |map-side combine (distinct-user support via count distinct
        |inside the trigram-keyed groups). Ordering is the suite's
        |total (epoch micros, event_id) tie break; top-20 is
        |TakeOrdered with (support desc, path) determinism.""".stripMargin,
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS p1,
        |    lag(event_type, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |t AS (SELECT p2 || '>' || p1 || '>' || event_type AS path, user_id
        |      FROM o WHERE p2 IS NOT NULL)
        |SELECT path, count(*) AS n_occurrences,
        |  count(DISTINCT user_id) AS n_users
        |FROM t GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochUs(col("ts")), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          // both lags in ONE projection so they plan as a single
          // Window operator (one sort, one pass) rather than two
          lag(col("event_type"), 1).over(w).as("p1"),
          lag(col("event_type"), 2).over(w).as("p2"))
        .filter(col("p2").isNotNull)
        .select(concat_ws(">", col("p2"), col("p1"), col("event_type")).as("path"),
          col("user_id"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(20)
    },

    // ----------------------------------------------------------------
    q("q162_spend_trend",
      """Per-user spend TREND by closed-form least squares — distributed
        |regression as pure aggregation: slope of cents against
        |days-since-launch is (n·Σtx − Σt·Σx) / (n·Σt² − (Σt)²), so one
        |user-keyed groupBy computing five sums yields every user's
        |trend in a single shuffle with map-side combine — no iteration,
        |no solver, no per-user sort. The time axis anchors on min(ts)
        |over the DATA (q146's reproducibility discipline: the result
        |is a pure function of the dataset). Numerator and denominator
        |are emitted EXACTLY alongside the floor-divided slope in
        |micro-cents/day, and the degenerate single-day user (den = 0)
        |reports slope 0 rather than dividing — all decisions integer,
        |both engines identical. Bounds: t ≤ horizon days, cents <
        |2^16 → n·Σtx at 1e3 events/user ~ 1e12, ×1e6 still inside
        |int64; a longer horizon moves the slope scale factor down, not
        |the algorithm.""".stripMargin,
      """WITH a AS (SELECT min(ts) AS t0 FROM events),
        |c AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - epoch_us(a.t0)) // 86400000000 AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events, a),
        |g AS (
        |  SELECT user_id, count(*)::BIGINT AS n,
        |    CAST(sum(t) AS BIGINT) AS st, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(t * x) AS BIGINT) AS stx, CAST(sum(t * t) AS BIGINT) AS stt
        |  FROM c GROUP BY 1)
        |SELECT user_id, n,
        |  n * stx - st * sx AS slope_num, n * stt - st * st AS slope_den,
        |  CASE WHEN n * stt - st * st = 0 THEN 0
        |       WHEN n * stx - st * sx >= 0
        |       THEN (1000000 * (n * stx - st * sx)) // (n * stt - st * st)
        |       ELSE -((1000000 * (st * sx - n * stx)) // (n * stt - st * st))
        |  END AS slope_microcents_day
        |FROM g""".stripMargin) { (s, dir) =>
      val anchor = Tables.events(s, dir).agg(min(col("ts")).as("t0"))
      Tables.events(s, dir)
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          expr("(unix_micros(ts) - unix_micros(t0)) DIV 86400000000").as("t"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("x"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("t")).cast("long").as("st"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("t") * col("x")).cast("long").as("stx"),
          sum(col("t") * col("t")).cast("long").as("stt"))
        .select(col("user_id"), col("n"),
          (col("n") * col("stx") - col("st") * col("sx")).as("slope_num"),
          (col("n") * col("stt") - col("st") * col("st")).as("slope_den"),
          // division runs on the MAGNITUDE with the sign reapplied, so
          // Spark's truncating DIV and DuckDB's flooring // cannot
          // disagree on negative slopes (den > 0 always; num may not be)
          expr("""CASE WHEN n * stt - st * st = 0 THEN 0
                 |     WHEN n * stx - st * sx >= 0
                 |     THEN (1000000 * (n * stx - st * sx)) DIV (n * stt - st * st)
                 |     ELSE -((1000000 * (st * sx - n * stx)) DIV (n * stt - st * st))
                 |END""".stripMargin).as("slope_microcents_day"))
    },

    // ----------------------------------------------------------------
    q("q164_session_entry_stats",
      """Session-grain product metrics by ENTRY event type — the bounce
        |report built on q21's sessionization (same >2h-gap rule, same
        |one-shuffle two-window plan): per entry type, session count,
        |bounce count (single-event sessions), bounce rate in integer
        |permille, and mean session duration in whole seconds. The
        |entry event is picked engine-independently two DIFFERENT ways
        |that must agree: Spark takes min(struct(t, event_id, type))
        |inside the session aggregate (the q95 first-occurrence
        |discipline — no extra window), the oracle takes the rn = 1 row
        |of a session-keyed row_number; (t, event_id) is a total order,
        |so both pick the same event. All derived rates are floor
        |divisions of nonnegative integers. Scale shape: the session
        |windows are user-keyed; the session aggregate collapses events
        |to session rows; the final shuffle carries |types| groups.""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
        |         OR lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked),
        |f AS (
        |  SELECT user_id, session_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM sess),
        |g AS (
        |  SELECT user_id, session_id, count(*)::BIGINT AS n_events,
        |    CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS dur_us
        |  FROM sess GROUP BY 1, 2)
        |SELECT f.event_type AS entry_type, count(*)::BIGINT AS n_sessions,
        |  CAST(sum(CASE WHEN g.n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
        |  (1000 * CAST(sum(CASE WHEN g.n_events = 1 THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*) AS bounce_permille,
        |  (CAST(sum(g.dur_us) AS BIGINT) // count(*)) // 1000000 AS mean_duration_s
        |FROM f JOIN g USING (user_id, session_id)
        |WHERE f.rn = 1
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gap = epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(byTs)
      val sess = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("brk", when(gap > 7200000000L || gap.isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(cum).cast("long"))
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(struct(epochUs(col("ts")).as("t"), col("event_id").as("e"),
            col("event_type").as("y"))).as("first"),
          (max(epochUs(col("ts"))) - min(epochUs(col("ts")))).as("dur_us"))
        .groupBy(col("first.y").as("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).cast("long").as("n_bounces"),
          sum(col("dur_us")).cast("long").as("dur"))
        .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
          expr("(1000 * n_bounces) DIV n_sessions").as("bounce_permille"),
          expr("(dur DIV n_sessions) DIV 1000000").as("mean_duration_s"))
    },

    // ----------------------------------------------------------------
    q("q166_time_weighted_value",
      """Per-user TIME-WEIGHTED average value (TWAP) — the feature a
        |pricing/engagement pipeline wants when events are irregular:
        |treat each event's value as a step function held until the
        |user's next event and integrate.  One lead() in a user-keyed
        |window yields every segment's width; the integral Σ cents·Δt
        |and the span max(t)−min(t) are then plain user-keyed sums —
        |one window + one groupBy on the SAME key, so a single hash
        |shuffle end to end (the agg reuses the window's
        |partitioning).  All arithmetic is integer-exact: cents ≤
        |~50 000 and span ≤ horizon µs keep Σ cents·Δt under 4e17;
        |the millicents quotient is computed as the overflow-free
        |identity 1000·⌊n/d⌋ + ⌊(n mod d)·1000/d⌋ = ⌊1000n/d⌋ (valid
        |since n, d ≥ 0 here — values are positive in this schema),
        |so neither engine ever forms 1000·n.  Single-event users
        |(span 0) report 0 by convention, decided by the same CASE in
        |both engines.""".stripMargin,
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |seg AS (
        |  SELECT user_id, cents,
        |    coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id), t) - t AS dt,
        |    t
        |  FROM c),
        |g AS (
        |  SELECT user_id, count(*)::BIGINT AS n_events,
        |    CAST(max(t) - min(t) AS BIGINT) AS span_us,
        |    CAST(sum(cents * dt) AS BIGINT) AS vt_integral
        |  FROM seg GROUP BY 1)
        |SELECT user_id, n_events, span_us, vt_integral,
        |  CASE WHEN span_us = 0 THEN 0
        |       ELSE 1000 * (vt_integral // span_us)
        |            + ((vt_integral % span_us) * 1000) // span_us
        |  END AS twap_millicents
        |FROM g""".stripMargin) { (s, dir) =>
      val byT = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("t"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .withColumn("dt", coalesce(lead(col("t"), 1).over(byT), col("t")) - col("t"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("t")) - min(col("t"))).as("span_us"),
          sum(col("cents") * col("dt")).cast("long").as("vt_integral"))
        .select(col("user_id"), col("n_events"), col("span_us"), col("vt_integral"),
          expr("""CASE WHEN span_us = 0 THEN 0
                 |     ELSE 1000 * (vt_integral DIV span_us)
                 |          + ((vt_integral % span_us) * 1000) DIV span_us
                 |END""".stripMargin).as("twap_millicents"))
    },

    // ----------------------------------------------------------------
    q("q167_first_touch_attribution",
      """FIRST-TOUCH revenue attribution — q164's sessionization (same
        |>2h-gap rule, same single user-keyed shuffle) answering the
        |marketing question the bounce report doesn't: which session
        |ENTRY event type leads to purchases?  Per session the entry is
        |min(struct(t, event_id, type)) — the q95/q164 first-occurrence
        |discipline, no extra window — and the session's purchase
        |revenue is a conditional cents sum riding the SAME aggregate.
        |The rollup to entry types then reports sessions, converted
        |sessions (≥1 purchase), attributed revenue, conversion
        |permille and mean attributed cents — every rate a floor
        |division of nonnegative integers, identical cross-engine.
        |Scale shape: events collapse to session rows inside the
        |user-keyed aggregate (bounded state per session, no
        |re-shuffle), and the final shuffle carries |entry types|
        |groups.""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
        |         OR lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type, cents,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked),
        |f AS (
        |  SELECT user_id, session_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |                       ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM sess),
        |g AS (
        |  SELECT user_id, session_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS purchase_cents
        |  FROM sess GROUP BY 1, 2)
        |SELECT f.event_type AS entry_type, count(*)::BIGINT AS n_sessions,
        |  CAST(sum(CASE WHEN g.purchase_cents > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CAST(sum(g.purchase_cents) AS BIGINT) AS attributed_cents,
        |  (1000 * CAST(sum(CASE WHEN g.purchase_cents > 0 THEN 1 ELSE 0 END) AS BIGINT))
        |    // count(*) AS conversion_permille,
        |  CAST(sum(g.purchase_cents) AS BIGINT) // count(*) AS mean_cents_per_session
        |FROM f JOIN g USING (user_id, session_id)
        |WHERE f.rn = 1
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gap = epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(byTs)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .withColumn("brk", when(gap > 7200000000L || gap.isNull, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(cum).cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(struct(epochUs(col("ts")).as("t"), col("event_id").as("e"),
            col("event_type").as("y"))).as("first"),
          sum(when(col("event_type") === "purchase", col("cents"))
            .otherwise(0L)).cast("long").as("purchase_cents"))
        .groupBy(col("first.y").as("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("purchase_cents") > 0, 1L).otherwise(0L)).cast("long").as("n_converted"),
          sum(col("purchase_cents")).cast("long").as("attributed_cents"))
        .select(col("entry_type"), col("n_sessions"), col("n_converted"),
          col("attributed_cents"),
          expr("(1000 * n_converted) DIV n_sessions").as("conversion_permille"),
          expr("attributed_cents DIV n_sessions").as("mean_cents_per_session"))
    },

    // ----------------------------------------------------------------
    q("q170_winsorized_value",
      """Winsorized (p05/p95-clamped) mean value per event type — the
        |robust statistic a feature pipeline substitutes for the raw
        |mean once outliers exist, computed EXACTLY by q154's
        |histogram-inversion discipline: the cents domain is bounded
        |(≤ ~50 000 distinct values), so the per-type value histogram
        |is aggregate-sized, the cumulative count runs in a window
        |over that HISTOGRAM (never over the event rows — the window
        |partition is domain-bounded at any data scale), and the
        |order statistics fall out as the first histogram bin whose
        |cumulative count reaches ⌈0.05n⌉ / ⌈0.95n⌉ (1-based,
        |ceil as (5n+99) DIV 100 — pure integer).  The clamped sum is
        |then a second pass over the SAME histogram (cnt·clamp), so
        |event rows are scanned once and shuffled once, on the
        |(type, cents) histogram key with map-side combine.  Both
        |means are floor-divided millicents — all integer, identical
        |cross-engine.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |hist AS (SELECT event_type, cents, count(*)::BIGINT AS cnt
        |         FROM c GROUP BY 1, 2),
        |h2 AS (
        |  SELECT event_type, cents, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM hist),
        |b AS (
        |  SELECT event_type, max(n) AS n_events,
        |    min(CASE WHEN cum >= (5 * n + 99) // 100 THEN cents END) AS p05_cents,
        |    min(CASE WHEN cum >= (95 * n + 99) // 100 THEN cents END) AS p95_cents
        |  FROM h2 GROUP BY 1)
        |SELECT b.event_type, b.n_events, b.p05_cents, b.p95_cents,
        |  (1000 * CAST(sum(hist.cnt * hist.cents) AS BIGINT)) // b.n_events
        |    AS raw_mean_millicents,
        |  (1000 * CAST(sum(hist.cnt *
        |     greatest(b.p05_cents, least(b.p95_cents, hist.cents))) AS BIGINT))
        |    // b.n_events AS winsorized_mean_millicents
        |FROM hist JOIN b ON b.event_type = hist.event_type
        |GROUP BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
      val hist = Tables.events(s, dir)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("cnt"))
      val cum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("event_type"))
      val bounds = hist
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"),
          min(when(expr("cum >= (5 * n + 99) DIV 100"), col("cents"))).as("p05_cents"),
          min(when(expr("cum >= (95 * n + 99) DIV 100"), col("cents"))).as("p95_cents"))
      hist.join(bounds, "event_type")
        .groupBy(col("event_type"), col("n_events"),
          col("p05_cents"), col("p95_cents"))
        .agg(sum(col("cnt") * col("cents")).cast("long").as("raw_sum"),
          sum(col("cnt") *
            greatest(col("p05_cents"), least(col("p95_cents"), col("cents"))))
            .cast("long").as("win_sum"))
        .select(col("event_type"), col("n_events"), col("p05_cents"),
          col("p95_cents"),
          expr("(1000 * raw_sum) DIV n_events").as("raw_mean_millicents"),
          expr("(1000 * win_sum) DIV n_events").as("winsorized_mean_millicents"))
    },

    // ----------------------------------------------------------------
    q("q172_hourly_cadence",
      """Per-user HOUR-OF-DAY concentration — the cadence fingerprint
        |behind the reference's suspicious-actor tier (SURVEY.md A1):
        |a human's activity spreads over waking hours; a cron-driven
        |bot hammers one or two UTC hours.  Per user: events, distinct
        |active hours (of 24), the peak hour and its permille share of
        |the user's traffic.  The peak is picked deterministically as
        |max(struct(cnt, -hour)) — largest count, ties to the EARLIEST
        |hour — the same argmax-without-a-window discipline as
        |q95/q164; the oracle uses an explicit row_number for an
        |independent formulation of the same total order.  Scale
        |shape: one shuffle to the (user, hour) histogram (≤ 24 rows
        |per user) with map-side combine, then a user-keyed roll-up of
        |that histogram — never a window over raw events.""".stripMargin,
      """WITH h AS (
        |  SELECT user_id, CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, hour, cnt,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY cnt DESC, hour) AS rn
        |  FROM h),
        |g AS (
        |  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
        |    count(*)::BIGINT AS n_active_hours
        |  FROM h GROUP BY 1)
        |SELECT g.user_id, g.n_events, g.n_active_hours,
        |  r.hour AS peak_hour,
        |  (1000 * r.cnt) // g.n_events AS peak_share_permille
        |FROM g JOIN r ON r.user_id = g.user_id AND r.rn = 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          expr("(unix_micros(ts) % 86400000000) DIV 3600000000").as("hour"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(sum(col("cnt")).cast("long").as("n_events"),
          count(lit(1)).as("n_active_hours"),
          max(struct(col("cnt").as("c"), (-col("hour")).as("nh"))).as("pk"))
        .select(col("user_id"), col("n_events"), col("n_active_hours"),
          (-col("pk.nh")).as("peak_hour"),
          expr("(1000 * pk.c) DIV n_events").as("peak_share_permille"))
    },

    // ----------------------------------------------------------------
    q("q173_conversion_lag",
      """Signup→purchase CONVERSION-LAG distribution — the
        |time-to-convert histogram that prices an acquisition funnel
        |(and the funnel tier's q112 complement: not whether the
        |sequence completes, but how LONG it takes): per user, the
        |first signup and the first purchase AT OR AFTER it; the lag
        |in whole days rolls up to a day-histogram with never-converted
        |users reported in the lag_days = -1 bucket.  Both engines
        |pick firsts by min() over a total order (ts, then event_id is
        |irrelevant here — min(ts) suffices since lag only needs the
        |timestamp), and the day floor-divides epoch micros.  Scale
        |shape: one user-keyed aggregate finds signup firsts; the
        |purchase scan joins it user-keyed (same partitioning), the
        |conditional min collapses per user, and the histogram shuffle
        |carries |distinct lags| groups.""".stripMargin,
      """WITH su AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        |  FROM events e JOIN su ON su.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.t_signup
        |  GROUP BY 1),
        |lags AS (
        |  SELECT su.user_id,
        |    CASE WHEN pu.t_purchase IS NULL THEN -1
        |         ELSE (pu.t_purchase - su.t_signup) // 86400000000 END AS lag_days
        |  FROM su LEFT JOIN pu ON pu.user_id = su.user_id)
        |SELECT lag_days, count(*)::BIGINT AS n_users
        |FROM lags GROUP BY 1""".stripMargin) { (s, dir) =>
      val su = Tables.events(s, dir)
        .filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(min(epochUs(col("ts"))).as("t_signup"))
      val pu = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(epochUs(col("ts")) >= col("t_signup"))
        .groupBy(col("user_id"))
        .agg(min(epochUs(col("ts"))).as("t_purchase"))
      su.join(pu, Seq("user_id"), "left")
        .select(when(col("t_purchase").isNull, lit(-1L))
          .otherwise(expr("(t_purchase - t_signup) DIV 86400000000"))
          .as("lag_days"))
        .groupBy(col("lag_days"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ----------------------------------------------------------------
    q("q174_scd2_dimension",
      """Slowly-changing-dimension TYPE 2 build — the warehouse
        |materialization q84's CDC classes stop short of: per user, the
        |full version history of a derived attribute (spend tier =
        |cents DIV 5000) as validity intervals.  Change points are rows
        |whose tier differs from the user's previous event (lag); each
        |keeps valid_from = its own event time and valid_to = the NEXT
        |change's time (lead over the change rows only), the open
        |current version carrying NULL.  Version numbers come from
        |row_number over the same change-row order — three window
        |passes, all on the SAME user key, so one shuffle and one sort
        |serve all of them.  Every boundary is epoch micros and the
        |tie order is (ts, event_id) — a total order, so both engines
        |cut identical versions.  Scale shape: user-keyed windows
        |(per-user history is bounded), no global window, and the
        |output is change-sized, not event-sized.""".stripMargin,
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 5000 AS tier
        |  FROM events),
        |d AS (
        |  SELECT user_id, event_id, t, tier,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_tier
        |  FROM e),
        |ch AS (SELECT user_id, event_id, t, tier FROM d
        |       WHERE prev_tier IS NULL OR tier <> prev_tier)
        |SELECT user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS version,
        |  tier, t AS valid_from_us,
        |  lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to_us,
        |  (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL)
        |    AS is_current
        |FROM ch""".stripMargin) { (s, dir) =>
      val byT = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      val ch = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("t"),
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 5000").as("tier"))
        .withColumn("prev_tier", lag(col("tier"), 1).over(byT))
        .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
      ch.select(col("user_id"),
          row_number().over(byT).cast("long").as("version"),
          col("tier"), col("t").as("valid_from_us"),
          lead(col("t"), 1).over(byT).as("valid_to_us"))
        .withColumn("is_current", col("valid_to_us").isNull)
    },

    // ----------------------------------------------------------------
    q("q225_ewma_control",
      """EWMA CONTROL CHART over the hourly event series — the
        |exponentially-weighted monitoring statistic of Roberts 1959
        |(the other classical anomaly detector beside q149's rolling
        |z-score: EWMA weights ALL history with geometric decay, where
        |the z-score weights a fixed frame uniformly), with λ = 1/2 and
        |the tail truncated at 16 lags so the whole statistic lives in
        |exact integers: baseline_t = Σ_{k=1..16} 2^(16−k)·cnt_{t−k}
        |(weight sum 2^16−1 = 65535; the lag-17+ tail a true EWMA
        |carries weighs < 1/65535 — below the chart's own resolution).
        |The hourly series is ZERO-FILLED onto each type's integer-hour
        |spine first (gap hours are real zero observations; lag over
        |the raw aggregate would silently compress quiet periods — the
        |control-chart equivalent of dropping evidence), the baseline
        |EXCLUDES the current hour (q149's self-exclusion discipline),
        |and an hour flags when cnt·65535 > 2·baseline — observed
        |traffic above twice its decayed history, division-free. Rows
        |emit only once 16 lags exist. Scale shape: ONE shuffle to the
        |(type, hour) histogram with map-side combine; the spine
        |explode is bounded by types × wall-clock hours (never event
        |count); the 16 lags unroll in ONE keyed window pass
        |(partition by type — state is 16 counters per partition);
        |everything downstream is scan-side integer arithmetic.""".stripMargin, {
      val wSql = (1 to 16).map(k => s"${1L << (16 - k)} * l$k").mkString(" + ")
      val lagsSql = (1 to 16).map(k =>
        s"lag(cnt, $k) OVER (PARTITION BY event_type ORDER BY h) AS l$k")
        .mkString(",\n        |    ")
      s"""WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |l AS (
        |  SELECT event_type, h, cnt,
        |    $lagsSql
        |  FROM z)
        |SELECT event_type, h AS epoch_hour, cnt,
        |  CAST($wSql AS BIGINT) AS baseline_num,
        |  (1000 * ($wSql)) // 65535 AS baseline_milli,
        |  CASE WHEN cnt * 65535 > 2 * ($wSql) THEN 1 ELSE 0 END AS spike_flag
        |FROM l WHERE l16 IS NOT NULL""".stripMargin
    }) { (s, dir) =>
      ewmaChart(Tables.events(s, dir))
    },

    // ----------------------------------------------------------------
    q("q227_cusum_changepoint",
      """CUSUM changepoint detection over the hourly event series — the
        |cumulative-sum chart of Page 1954, the classical detector for
        |a SUSTAINED mean shift (q225's EWMA reacts to level, q149's
        |z-score to single spikes; CUSUM accumulates small persistent
        |drift until it crosses a decision interval). The textbook
        |recurrence S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k) is a
        |running-max-reset no window AGGREGATE expresses — but it has
        |the exact closed form S⁺_t = P_t − min(0, min_{j≤t} P_j) over
        |the prefix sums P of the excess series, which is TWO passes of
        |the same keyed window (running sum + running min), expressible
        |identically in both engines with zero recursion — the same
        |rewrite-to-closed-form discipline as q207's waterfilling.
        |Target μ and allowance k = μ/4 come from each type's own
        |zero-filled spine mean (milli-integer floor divides); the
        |alarm fires at S⁺ > 8μ (the 4-5σ decision-interval convention
        |scaled to the mean on this deterministic corpus). All integer,
        |division only in the per-type constants. Scale shape: q225's
        |spine (ONE histogram shuffle, hours-bounded explode), a
        ||types|-row mean agg broadcast back, then ONE keyed window
        |pass computing both running aggregates — never a partition-
        |less window, state O(1) per partition.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |m AS (
        |  SELECT event_type,
        |    (1000 * CAST(sum(cnt) AS BIGINT)) // count(*) AS mu_milli
        |  FROM z GROUP BY 1),
        |y AS (
        |  SELECT z.event_type, z.h, z.cnt, m.mu_milli,
        |    1000 * z.cnt - m.mu_milli - m.mu_milli // 4 AS y_milli
        |  FROM z JOIN m ON m.event_type = z.event_type),
        |p AS (
        |  SELECT event_type, h, cnt, mu_milli,
        |    CAST(sum(y_milli) OVER w AS BIGINT) AS pre
        |  FROM y
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |               ROWS UNBOUNDED PRECEDING)),
        |sc AS (
        |  SELECT event_type, h, cnt, mu_milli, pre,
        |    CAST(min(pre) OVER w AS BIGINT) AS mn
        |  FROM p
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |               ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, h AS epoch_hour, cnt,
        |  pre - least(CAST(0 AS BIGINT), mn) AS cusum_milli,
        |  8 * mu_milli AS thresh_milli,
        |  CASE WHEN pre - least(CAST(0 AS BIGINT), mn) > 8 * mu_milli
        |       THEN 1 ELSE 0 END AS alarm
        |FROM sc""".stripMargin) { (s, dir) =>
      cusumChart(Tables.events(s, dir))
    },

    // ----------------------------------------------------------------
    q("q228_theil_sen",
      """Theil-Sen robust trend per event type — the median-of-pairwise-
        |slopes estimator (Theil 1950; Sen 1968; 29% breakdown point
        |where q191's least squares has zero: a burst-day outlier drags
        |OLS but not the pair median) over each type's daily count
        |series, with the matching median-residual intercept. Exact
        |integers throughout: slopes are milli-units by truncating
        |division (BOTH engines truncate toward zero on negatives —
        |pinned by this pair's hash), the median is the LOWER median,
        |element (n+1) div 2 of the sorted list — never an averaged
        |midpoint that would need fractions. Scale shape: the daily
        |series is ONE (type, day)-keyed count with map-side combine,
        ||types|×|days| rows TOTAL — the O(n²) pair expansion runs on
        |that TINY aggregate (the q191 moral: reduce first, then pay
        |quadratic cost on the reduction — 30 days is 435 pairs), via a
        |broadcast triangular self-join; medians use the q82 zero-
        |window shape (sorted array in a per-type aggregate row, rank =
        |array position) — no partition-less window anywhere.""".stripMargin,
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |pr AS (
        |  SELECT a.event_type,
        |    (1000 * (b.cnt - a.cnt)) // (b.d - a.d) AS slope
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.d < b.d),
        |sl AS (
        |  SELECT event_type, count(*)::BIGINT AS n_pairs,
        |    list_sort(list(slope))[(count(*) + 1) // 2] AS slope_milli
        |  FROM pr GROUP BY 1),
        |r AS (
        |  SELECT daily.event_type, sl.n_pairs, sl.slope_milli,
        |    1000 * daily.cnt - sl.slope_milli * daily.d AS resid
        |  FROM daily JOIN sl ON sl.event_type = daily.event_type)
        |SELECT event_type, count(*)::BIGINT AS n_days, n_pairs,
        |  CAST(slope_milli AS BIGINT) AS slope_milli,
        |  CAST(list_sort(list(resid))[(count(*) + 1) // 2] AS BIGINT)
        |    AS intercept_milli
        |FROM r GROUP BY 1, 3, 4""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("d"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      // explicit renames on the self-join's right side: disambiguation
      // by df("col") references resolves BOTH sides to the same lineage
      // here (daily is one plan) and Spark warns about a trivially-true
      // predicate — renamed columns make the condition unambiguous
      val a = daily.select(col("event_type"), col("d").as("da"), col("cnt").as("ca"))
      val b = daily.select(col("event_type").as("et_b"), col("d").as("db"),
        col("cnt").as("cb"))
      val sl = a.join(broadcast(b),
          col("event_type") === col("et_b") && col("da") < col("db"))
        .select(col("event_type"),
          expr("(1000 * (cb - ca)) DIV (db - da)").as("slope"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          sort_array(collect_list(col("slope"))).as("xs"))
        .select(col("event_type"), col("n_pairs"),
          element_at(col("xs"),
            ((col("n_pairs") + 1) / 2).cast("int")).as("slope_milli"))
      daily.join(broadcast(sl), Seq("event_type"))
        .select(col("event_type"), col("n_pairs"), col("slope_milli"),
          (lit(1000) * col("cnt") - col("slope_milli") * col("d")).as("resid"))
        .groupBy(col("event_type"), col("n_pairs"), col("slope_milli"))
        .agg(count(lit(1)).cast("bigint").as("n_days"),
          sort_array(collect_list(col("resid"))).as("rs"))
        .select(col("event_type"), col("n_days"), col("n_pairs"),
          col("slope_milli").cast("bigint").as("slope_milli"),
          element_at(col("rs"), ((col("n_days") + 1) / 2).cast("int"))
            .cast("bigint").as("intercept_milli"))
    },

    // ----------------------------------------------------------------
    q("q229_mann_kendall",
      """Mann-Kendall trend TEST per event type — the nonparametric
        |significance companion to q228's Theil-Sen estimate (Mann
        |1945; Kendall 1975; the pair is the standard hydrology/
        |monitoring stack: Sen's slope says HOW steep, Mann-Kendall
        |says WHETHER the monotone trend is real): S = Σ_{i<j}
        |sign(y_j − y_i) over the daily count series, its null variance
        |with the full TIE CORRECTION Var = [n(n−1)(2n+5) −
        |Σ_t t(t−1)(2t+5)]/18 (t = size of each tied-value group — the
        |counts are small integers, ties are the norm, and skipping the
        |correction inflates significance), and the two-sided decision
        |at α = 0.05 evaluated DIVISION-FREE: with the ±1 continuity
        |correction the test |z| > 1.96 squares to (|S|−1)² >
        |1.96²·Var, and since 1.96 = 49/25 exactly and 18·Var is the
        |integer numerator var18, it cross-multiplies to
        |(|S|−1)²·625·18 > var18·2401 — no division, no sqrt, no float
        |anywhere (the q149 cleared-form discipline). Scale shape: identical
        |to q228 — pair expansion only on the tiny (type, day)
        |aggregate via broadcast triangular self-join; the tie census
        |is a (type, count-value) aggregate of that same tiny frame.""".stripMargin,
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT a.event_type,
        |    CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
        |                  WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.d < b.d
        |  GROUP BY 1),
        |n AS (SELECT event_type, count(*)::BIGINT AS n_days FROM daily GROUP BY 1),
        |ties AS (
        |  SELECT event_type,
        |    CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
        |  FROM (SELECT event_type, cnt, count(*)::BIGINT AS t
        |        FROM daily GROUP BY 1, 2)
        |  WHERE t >= 2 GROUP BY 1)
        |SELECT n.event_type, n.n_days, s.s_stat,
        |  n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
        |    - coalesce(ties.tie_term, 0) AS var18,
        |  CASE WHEN abs(s.s_stat) > 0 AND
        |    (abs(s.s_stat) - 1) * (abs(s.s_stat) - 1) * 625 * 18
        |      > (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
        |         - coalesce(ties.tie_term, 0)) * 2401
        |    THEN 1 ELSE 0 END AS significant
        |FROM n JOIN s ON s.event_type = n.event_type
        |LEFT JOIN ties ON ties.event_type = n.event_type""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 86400000000").as("d"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      val a = daily.select(col("event_type"), col("d").as("da"), col("cnt").as("ca"))
      val b = daily.select(col("event_type").as("et_b"), col("d").as("db"),
        col("cnt").as("cb"))
      val sStat = a.join(broadcast(b),
          col("event_type") === col("et_b") && col("da") < col("db"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("cb") > col("ca"), 1L)
          .when(col("cb") < col("ca"), -1L).otherwise(0L))
          .cast("bigint").as("s_stat"))
      val n = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n_days"))
      val ties = daily.groupBy(col("event_type"), col("cnt"))
        .agg(count(lit(1)).cast("bigint").as("t"))
        .filter(col("t") >= 2)
        .groupBy(col("event_type"))
        .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
          .cast("bigint").as("tie_term"))
      n.join(broadcast(sStat), Seq("event_type"))
        .join(broadcast(ties), Seq("event_type"), "left")
        .select(col("event_type"), col("n_days"), col("s_stat"),
          (expr("n_days * (n_days - 1) * (2 * n_days + 5)")
            - coalesce(col("tie_term"), lit(0L))).as("var18"),
          when(abs(col("s_stat")) > 0 &&
            (abs(col("s_stat")) - 1) * (abs(col("s_stat")) - 1) * 625 * 18 >
              (expr("n_days * (n_days - 1) * (2 * n_days + 5)")
                - coalesce(col("tie_term"), lit(0L))) * 2401, 1)
            .otherwise(0).as("significant"))
    },

    // ----------------------------------------------------------------
    q("q235_survival_hazard",
      """USER-LIFETIME SURVIVAL — the Nelson-Aalen cumulative-hazard
        |estimator (Nelson 1972; Aalen 1978; the Kaplan-Meier 1958
        |framing with the log-free cumulative SUM instead of the
        |product, which is why it runs exact here): lifetime = days
        |between a user's first and last event; a churn is OBSERVED
        |when the last event precedes the corpus horizon (max event
        |day) and CENSORED at the horizon otherwise — dropping
        |censoring (the naive churn-rate mistake) biases hazards up,
        |because horizon-day users haven't had the chance to churn.
        |Per distinct lifetime t: the risk set n(t) = users with
        |lifetime ≥ t, observed churns d(t), censored exits c(t), the
        |hazard increment (10⁶·d) div n and the Nelson-Aalen cumulative
        |hazard Σ_{s≤t} of those floor-divided increments (term-wise
        |floors, so both engines sum identical integers). Scale shape:
        |ONE user-keyed min/max agg (map-side combine) → a
        ||lifetimes|-row table (bounded by the observation WINDOW in
        |days, never by users — the control-chart sublinearity class);
        |risk sets and the cumulation are broadcast non-equi self-joins
        |of that tiny table (the q212 trick — no partition-less
        |window); the horizon is a 1-row broadcast.""".stripMargin,
      """WITH u AS (
        |  SELECT user_id,
        |    min(epoch_us(ts) // 86400000000) AS d0,
        |    max(epoch_us(ts) // 86400000000) AS d1
        |  FROM events GROUP BY 1),
        |hz AS (SELECT max(d1) AS horizon FROM u),
        |lt AS (
        |  SELECT u.d1 - u.d0 AS t,
        |    CASE WHEN u.d1 < hz.horizon THEN 1 ELSE 0 END AS observed
        |  FROM u, hz),
        |ev AS (
        |  SELECT t,
        |    CAST(sum(observed) AS BIGINT) AS d_events,
        |    CAST(sum(1 - observed) AS BIGINT) AS c_censored,
        |    count(*)::BIGINT AS exits
        |  FROM lt GROUP BY 1),
        |rk AS (
        |  SELECT a.t, a.d_events, a.c_censored,
        |    CAST(sum(b.exits) AS BIGINT) AS n_risk
        |  FROM ev a JOIN ev b ON b.t >= a.t
        |  GROUP BY 1, 2, 3),
        |hzd AS (
        |  SELECT t, n_risk, d_events, c_censored,
        |    (1000000 * d_events) // n_risk AS hazard_micro
        |  FROM rk)
        |SELECT a.t AS t_days, a.n_risk, a.d_events, a.c_censored,
        |  a.hazard_micro,
        |  CAST(sum(b.hazard_micro) AS BIGINT) AS cum_hazard_micro
        |FROM hzd a JOIN hzd b ON b.t <= a.t
        |GROUP BY 1, 2, 3, 4, 5""".stripMargin) { (s, dir) =>
      val u = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(expr("unix_micros(ts) DIV 86400000000")).as("d0"),
          max(expr("unix_micros(ts) DIV 86400000000")).as("d1"))
      val hz = u.agg(max(col("d1")).as("horizon"))
      val ev = u.crossJoin(broadcast(hz))
        .select((col("d1") - col("d0")).as("t"),
          when(col("d1") < col("horizon"), 1L).otherwise(0L).as("observed"))
        .groupBy(col("t"))
        .agg(sum(col("observed")).cast("bigint").as("d_events"),
          sum(lit(1L) - col("observed")).cast("bigint").as("c_censored"),
          count(lit(1)).cast("bigint").as("exits"))
      val rk = ev.select(col("t"), col("d_events"), col("c_censored"))
        .join(broadcast(ev.select(col("t").as("tb"), col("exits"))),
          col("tb") >= col("t"))
        .groupBy(col("t"), col("d_events"), col("c_censored"))
        .agg(sum(col("exits")).cast("bigint").as("n_risk"))
        .withColumn("hazard_micro", expr("(1000000 * d_events) DIV n_risk"))
      rk.select(col("t"), col("n_risk"), col("d_events"), col("c_censored"),
          col("hazard_micro"))
        .join(broadcast(rk.select(col("t").as("tb"),
            col("hazard_micro").as("hb"))),
          col("tb") <= col("t"))
        .groupBy(col("t").as("t_days"), col("n_risk"), col("d_events"),
          col("c_censored"), col("hazard_micro"))
        .agg(sum(col("hb")).cast("bigint").as("cum_hazard_micro"))
    },

    // ----------------------------------------------------------------
    q("q238_autocorrelation",
      """EXACT sample autocorrelation of the hourly series at lags 1
        |and 24 (Box & Jenkins 1970's identification tool: lag-1 says
        |momentum, lag-24 says daily seasonality — the two numbers that
        |decide whether q225/q227's i.i.d.-style baselines are even
        |appropriate for a series): r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)²
        |computed DIVISION-FREE until the final milli ratio by the
        |n-scaling trick — d_t = n·x_t − S is integer, and r_k =
        |Σ d_t·d_{t−k} / Σ d_t² exactly (the n² factors cancel), so
        |both engines sum identical integers and divide once (both
        |truncate toward zero on the possibly-negative numerator).
        |Magnitudes: |d| ≤ n·max(x), squares ≤ 720²·counts² — far
        |inside int64 for any wall-clock-bounded series. Scale shape:
        |the q225 spine; per-type (n, S) broadcast back; ONE keyed
        |window pass yields both lag columns; the rest is a
        ||types|-row conditional aggregate unpivoted by stack().""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n, CAST(sum(cnt) AS BIGINT) AS s
        |  FROM z GROUP BY 1),
        |d AS (
        |  SELECT z.event_type, z.h, m.n, m.n * z.cnt - m.s AS d,
        |    lag(m.n * z.cnt - m.s, 1) OVER w AS d1,
        |    lag(m.n * z.cnt - m.s, 24) OVER w AS d24
        |  FROM z JOIN m ON m.event_type = z.event_type
        |  WINDOW w AS (PARTITION BY z.event_type ORDER BY z.h)),
        |a AS (
        |  SELECT event_type, max(n) AS n_hours,
        |    CAST(sum(d * d) AS BIGINT) AS den,
        |    CAST(sum(d * d1) AS BIGINT) AS num1,
        |    CAST(sum(d * d24) AS BIGINT) AS num24
        |  FROM d GROUP BY 1)
        |SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
        |  CAST(lag_k AS BIGINT) AS lag_k, num, den,
        |  (1000 * num) // den AS acf_milli
        |FROM (
        |  SELECT event_type, n_hours, 1 AS lag_k, num1 AS num, den FROM a
        |  UNION ALL
        |  SELECT event_type, n_hours, 24, num24, den FROM a)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val z = hourlySpineOf(Tables.events(s, dir))
      val m = z.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cnt")).cast("bigint").as("s"))
      val d = z.join(broadcast(m), Seq("event_type"))
        .withColumn("d", col("n") * col("cnt") - col("s"))
        .withColumn("d1", lag(col("d"), 1).over(w))
        .withColumn("d24", lag(col("d"), 24).over(w))
      d.groupBy(col("event_type"))
        .agg(max(col("n")).as("n_hours"),
          sum(col("d") * col("d")).cast("bigint").as("den"),
          sum(col("d") * col("d1")).cast("bigint").as("num1"),
          sum(col("d") * col("d24")).cast("bigint").as("num24"))
        .selectExpr("event_type", "n_hours",
          "stack(2, CAST(1 AS BIGINT), num1, CAST(24 AS BIGINT), num24) AS (lag_k, num)",
          "den")
        .select(col("event_type"), col("n_hours"), col("lag_k"), col("num"),
          col("den"), expr("(1000 * num) DIV den").as("acf_milli"))
    },

    // ----------------------------------------------------------------
    q("q239_changepoint_location",
      """CHANGEPOINT LOCATION by the at-most-one-change CUSUM argmax
        |(Hinkley 1970; Taylor 2000's change-point-analysis practice:
        |where q227 says WHETHER the series drifted, this says WHERE —
        |the hour t maximizing |Σ_{s≤t}(x_s − x̄)| splits the series at
        |its most likely level change), with the before/after means the
        |split implies. Division-free core via the same n-scaling as
        |q238: D_t = Σ_{s≤t}(n·x_s − S) is exact, its argmax picked by
        |the max(struct(|D|, −h)) total order (the q172 argmax-without-
        |a-second-window discipline; the prefix COUNT sum rides inside
        |the struct so the means come off the winning row, no join
        |back). The last hour is excluded — D there is identically 0
        |and a "change after everything" is no change. Scale shape: the
        |q225 spine, per-type (n, S) broadcast, ONE keyed window pass
        |for both prefix sums, then a |types|-row argmax aggregate.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n, CAST(sum(cnt) AS BIGINT) AS s
        |  FROM z GROUP BY 1),
        |p AS (
        |  SELECT z.event_type, z.h, m.n, m.s,
        |    CAST(sum(m.n * z.cnt - m.s) OVER w AS BIGINT) AS dd,
        |    CAST(sum(z.cnt) OVER w AS BIGINT) AS px,
        |    CAST(count(*) OVER w AS BIGINT) AS t
        |  FROM z JOIN m ON m.event_type = z.event_type
        |  WINDOW w AS (PARTITION BY z.event_type ORDER BY z.h
        |               ROWS UNBOUNDED PRECEDING)),
        |r AS (
        |  SELECT event_type, h, n, s, abs(dd) AS absd, px, t,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(dd) DESC, h) AS rn
        |  FROM p WHERE t < n)
        |SELECT event_type, h AS cp_hour, CAST(n AS BIGINT) AS n_hours,
        |  absd AS peak_abs_d,
        |  (1000 * px) // t AS mean_before_milli,
        |  (1000 * (s - px)) // (n - t) AS mean_after_milli
        |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val z = hourlySpineOf(Tables.events(s, dir))
      val m = z.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("cnt")).cast("bigint").as("s"))
      z.join(broadcast(m), Seq("event_type"))
        .withColumn("dd", sum(col("n") * col("cnt") - col("s")).over(w).cast("bigint"))
        .withColumn("px", sum(col("cnt")).over(w).cast("bigint"))
        .withColumn("t", count(lit(1)).over(w).cast("bigint"))
        .filter(col("t") < col("n"))
        .groupBy(col("event_type"))
        .agg(max(struct(abs(col("dd")).as("absd"), (-col("h")).as("nh"),
          col("px").as("px"), col("t").as("t"), col("n").as("n"),
          col("s").as("s"))).as("mx"))
        .select(col("event_type"), (-col("mx.nh")).as("cp_hour"),
          col("mx.n").as("n_hours"), col("mx.absd").as("peak_abs_d"),
          expr("(1000 * mx.px) DIV mx.t").as("mean_before_milli"),
          expr("(1000 * (mx.s - mx.px)) DIV (mx.n - mx.t)").as("mean_after_milli"))
    },

    // ----------------------------------------------------------------
    q("q240_seasonal_profile",
      """HOUR-OF-DAY seasonal profile — the seasonal-subseries summary
        |(Cleveland et al. 1990's STL decomposes against exactly this;
        |Hyndman & Athanasopoulos's seasonal-naive baseline forecasts
        |FROM it): for each (type, hour-of-day), the distribution of
        |that clock hour's counts across the observation window — n
        |observations, min, LOWER median, max and the exact milli mean.
        |This is the seasonal baseline q225/q227 deliberately do NOT
        |model (their charts treat all history alike; a diurnal service
        |needs deviation-from-profile, and this query IS the profile).
        |Zero-filled spine first, as everywhere in the chart family —
        |a silent 3 AM is a real observation of 0, and dropping it
        |biases every night-hour median up. Scale shape: the q225
        |spine, then ONE (type, hod)-keyed aggregate whose groups are
        |wall-clock-bounded (≤ 24·|types|, each holding window-days
        |observations) — the sorted-array median runs inside the
        |aggregate row (q82 shape), no window anywhere.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h % 24 AS hod,
        |    coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h)
        |SELECT event_type, CAST(hod AS BIGINT) AS hod,
        |  count(*)::BIGINT AS n_obs,
        |  CAST(min(cnt) AS BIGINT) AS min_cnt,
        |  CAST(list_sort(list(cnt))[(count(*) + 1) // 2] AS BIGINT) AS median_cnt,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  (1000 * CAST(sum(cnt) AS BIGINT)) // count(*) AS mean_milli
        |FROM z GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      hourlySpineOf(Tables.events(s, dir))
        .select(col("event_type"), (col("h") % 24).as("hod"), col("cnt"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).cast("bigint").as("n_obs"),
          min(col("cnt")).cast("bigint").as("min_cnt"),
          sort_array(collect_list(col("cnt"))).as("xs"),
          max(col("cnt")).cast("bigint").as("max_cnt"),
          sum(col("cnt")).cast("bigint").as("sm"))
        .select(col("event_type"), col("hod").cast("bigint").as("hod"),
          col("n_obs"), col("min_cnt"),
          element_at(col("xs"), ((col("n_obs") + 1) / 2).cast("int"))
            .cast("bigint").as("median_cnt"),
          col("max_cnt"), expr("(1000 * sm) DIV n_obs").as("mean_milli"))
    },

    // ----------------------------------------------------------------
    q("q242_hampel_outliers",
      """HAMPEL identifier over the hourly series — the median/MAD
        |outlier rule (Hampel 1974; Davies & Gather 1993 call it THE
        |robust detector: where q149's z-score lets a contaminated
        |frame inflate its own sigma until nothing flags — masking —
        |the median and the median absolute deviation have 50%
        |breakdown, so half the series can be garbage before the rule
        |lies): flag hour t when |x_t − med| > 3·MAD, both statistics
        |LOWER medians over the type's zero-filled spine, entirely in
        |integers (the raw-MAD form of the rule — the Gaussian 1.4826
        |consistency constant is irrational, so published practice at
        |integer scale states the threshold in raw MAD units, and 3 raw
        |MADs ≈ 2 sigma). Emits only the flagged hours. Scale shape:
        |the q225 spine; med and MAD are TWO |types|-row sorted-array
        |aggregates (arrays are wall-clock-bounded hours, the q240
        |class) broadcast back; the flag is a scan-side comparison.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |m AS (
        |  SELECT event_type,
        |    CAST(list_sort(list(cnt))[(count(*) + 1) // 2] AS BIGINT) AS med
        |  FROM z GROUP BY 1),
        |dv AS (
        |  SELECT z.event_type, z.h, z.cnt, m.med, abs(z.cnt - m.med) AS dev
        |  FROM z JOIN m ON m.event_type = z.event_type),
        |md AS (
        |  SELECT event_type,
        |    CAST(list_sort(list(dev))[(count(*) + 1) // 2] AS BIGINT) AS mad
        |  FROM dv GROUP BY 1)
        |SELECT dv.event_type, dv.h AS epoch_hour, dv.cnt, dv.med AS med_cnt,
        |  md.mad, dv.dev - 3 * md.mad AS excess
        |FROM dv JOIN md ON md.event_type = dv.event_type
        |WHERE dv.dev > 3 * md.mad""".stripMargin) { (s, dir) =>
      val z = hourlySpineOf(Tables.events(s, dir))
      val m = z.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("cnt"))).as("xs"),
          count(lit(1)).cast("bigint").as("n"))
        .select(col("event_type"),
          element_at(col("xs"), ((col("n") + 1) / 2).cast("int"))
            .cast("bigint").as("med"))
      val dv = z.join(broadcast(m), Seq("event_type"))
        .withColumn("dev", abs(col("cnt") - col("med")))
      val md = dv.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("dev"))).as("ds"),
          count(lit(1)).cast("bigint").as("n"))
        .select(col("event_type"),
          element_at(col("ds"), ((col("n") + 1) / 2).cast("int"))
            .cast("bigint").as("mad"))
      dv.join(broadcast(md), Seq("event_type"))
        .filter(col("dev") > lit(3) * col("mad"))
        .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"),
          col("med").as("med_cnt"), col("mad"),
          (col("dev") - lit(3) * col("mad")).as("excess"))
    },

    // ----------------------------------------------------------------
    q("q243_tukey_fences",
      """TUKEY FENCES over the hourly series — the boxplot far-outlier
        |rule (Tukey 1977's exploratory-data-analysis fences: beyond
        |q3 + 1.5·IQR is "outside", beyond 3·IQR "far out"; this emits
        |the 1.5 fence with the 3.0 flag alongside), quartiles as LOWER
        |order statistics at index (n+1) div 4 and 3(n+1) div 4 of the
        |sorted zero-filled spine, and the half-integer 1.5·IQR fence
        |evaluated CROSS-MULTIPLIED (2x vs 2·q3 + 3·IQR — no fractional
        |value ever materializes). The robust-outlier complement to
        |q242: MAD fences track the center's noise, quartile fences
        |track the bulk's spread — a series can trip one and not the
        |other, which is why EDA practice plots both. Scale shape: the
        |q225 spine; ONE |types|-row sorted-array aggregate yields both
        |quartiles; flags are scan-side comparisons.""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |qq AS (
        |  SELECT event_type,
        |    CAST(list_sort(list(cnt))[greatest((count(*) + 1) // 4, 1)]
        |      AS BIGINT) AS q1,
        |    CAST(list_sort(list(cnt))[(3 * (count(*) + 1)) // 4] AS BIGINT) AS q3
        |  FROM z GROUP BY 1)
        |SELECT z.event_type, z.h AS epoch_hour, z.cnt, qq.q1, qq.q3,
        |  CASE WHEN 2 * z.cnt > 2 * qq.q3 + 3 * (qq.q3 - qq.q1)
        |         OR 2 * z.cnt < 2 * qq.q1 - 3 * (qq.q3 - qq.q1)
        |       THEN 1 ELSE 0 END AS outside,
        |  CASE WHEN z.cnt > qq.q3 + 3 * (qq.q3 - qq.q1)
        |         OR z.cnt < qq.q1 - 3 * (qq.q3 - qq.q1)
        |       THEN 1 ELSE 0 END AS far_out
        |FROM z JOIN qq ON qq.event_type = z.event_type
        |WHERE 2 * z.cnt > 2 * qq.q3 + 3 * (qq.q3 - qq.q1)
        |   OR 2 * z.cnt < 2 * qq.q1 - 3 * (qq.q3 - qq.q1)""".stripMargin) { (s, dir) =>
      val z = hourlySpineOf(Tables.events(s, dir))
      val qq = z.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("cnt"))).as("xs"),
          count(lit(1)).cast("bigint").as("n"))
        .select(col("event_type"),
          element_at(col("xs"),
            greatest(((col("n") + 1) / 4).cast("int"), lit(1)))
            .cast("bigint").as("q1"),
          element_at(col("xs"), ((lit(3) * (col("n") + 1)) / 4).cast("int"))
            .cast("bigint").as("q3"))
      z.join(broadcast(qq), Seq("event_type"))
        .filter(lit(2) * col("cnt") > lit(2) * col("q3") + lit(3) * (col("q3") - col("q1")) ||
          lit(2) * col("cnt") < lit(2) * col("q1") - lit(3) * (col("q3") - col("q1")))
        .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"),
          col("q1"), col("q3"),
          when(lit(2) * col("cnt") > lit(2) * col("q3") + lit(3) * (col("q3") - col("q1")) ||
            lit(2) * col("cnt") < lit(2) * col("q1") - lit(3) * (col("q3") - col("q1")), 1)
            .otherwise(0).as("outside"),
          when(col("cnt") > col("q3") + lit(3) * (col("q3") - col("q1")) ||
            col("cnt") < col("q1") - lit(3) * (col("q3") - col("q1")), 1)
            .otherwise(0).as("far_out"))
    },

    // ----------------------------------------------------------------
    q("q244_rank_concordance",
      """RANK CO-MOVEMENT between event-type pairs — Goodman-Kruskal's
        |gamma and Kendall's tau-a (Goodman & Kruskal 1954; Kendall
        |1938) over each pair's hourly series on their SHARED spine
        |hours: do two traffic streams rise and fall together? Both
        |statistics are pure concordant/discordant pair counts, which
        |is why they run exact where Pearson's r (variance products,
        |sqrt) cannot: gamma = (C−D)/(C+D) ignores ties, tau-a =
        |(C−D)/C(n,2) charges them — reporting both shows how much tie
        |mass the integer-valued series carries. Quadratic in the
        |WINDOW, not the data (the q228 moral): the hour-pair space is
        |C(720,2) per type pair regardless of corpus size, built by a
        |triangular self-join of the broadcast hours-bounded joined
        |spine. Both ratios integer milli with truncating division
        |(sign-consistent cross-engine).""".stripMargin,
      """WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM c GROUP BY 1),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM b),
        |z AS (
        |  SELECT sp.event_type, sp.h, coalesce(c.cnt, 0)::BIGINT AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |j AS (
        |  SELECT a.event_type AS et_a, b.event_type AS et_b, a.h,
        |    a.cnt AS x, b.cnt AS y
        |  FROM z a JOIN z b ON a.h = b.h AND a.event_type < b.event_type),
        |pr AS (
        |  SELECT p.et_a, p.et_b,
        |    count(*)::BIGINT AS n_pairs,
        |    CAST(sum(CASE WHEN (q.x - p.x) * (q.y - p.y) > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN (q.x - p.x) * (q.y - p.y) < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS discordant
        |  FROM j p JOIN j q
        |    ON q.et_a = p.et_a AND q.et_b = p.et_b AND p.h < q.h
        |  GROUP BY 1, 2)
        |SELECT et_a, et_b, n_pairs, concordant, discordant,
        |  (1000 * (concordant - discordant))
        |    // greatest(concordant + discordant, 1) AS gamma_milli,
        |  (1000 * (concordant - discordant)) // n_pairs AS tau_a_milli
        |FROM pr""".stripMargin) { (s, dir) =>
      val z = hourlySpineOf(Tables.events(s, dir))
      val j = z.select(col("event_type").as("et_a"), col("h"), col("cnt").as("x"))
        .join(z.select(col("event_type").as("et_b"), col("h"), col("cnt").as("y")),
          Seq("h"))
        .filter(col("et_a") < col("et_b"))
      val p2 = j.select(col("et_a"), col("et_b"), col("h").as("h2"),
        col("x").as("x2"), col("y").as("y2"))
      j.join(broadcast(p2), Seq("et_a", "et_b"))
        .filter(col("h") < col("h2"))
        .groupBy(col("et_a"), col("et_b"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          sum(when((col("x2") - col("x")) * (col("y2") - col("y")) > 0, 1L)
            .otherwise(0L)).cast("bigint").as("concordant"),
          sum(when((col("x2") - col("x")) * (col("y2") - col("y")) < 0, 1L)
            .otherwise(0L)).cast("bigint").as("discordant"))
        .select(col("et_a"), col("et_b"), col("n_pairs"),
          col("concordant"), col("discordant"),
          expr("""(1000 * (concordant - discordant))
                 |DIV greatest(concordant + discordant, 1)""".stripMargin)
            .as("gamma_milli"),
          expr("(1000 * (concordant - discordant)) DIV n_pairs").as("tau_a_milli"))
    },

    // ----------------------------------------------------------------
    q("q250_retention_cohorts",
      """Cohort retention triangle — the product-analytics standard
        |(Croll & Yoskovitz 2013 "Lean Analytics" cohort analysis;
        |every growth dashboard's weekly table): users grouped by FIRST
        |active day, then for each (cohort, day-offset) cell the count
        |of cohort members active that day and its share of the cohort,
        |in permille. Days are pure integer epoch-day indices
        |(unix_micros DIV 86.4e9 — no calendar functions to diverge
        |on). Scale shape: activity collapses to DISTINCT (user, day)
        |pairs in one user-keyed agg with map-side combine; the
        |first-day table comes from the SAME keyed frame (groupBy min,
        |co-partitioned join back on user — the shuffle is reused, the
        |corpus is never re-read); the census is (cohort, offset)-keyed
        |— bounded by observation-window DAYS squared, the wall-clock
        |sublinearity class (q235) — and cohort sizes broadcast back
        |onto it from its own offset-0 slice. No window, no driver
        |data.""".stripMargin,
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1),
        |c AS (SELECT f.cohort_day, ud.day - f.cohort_day AS offset_days,
        |        count(*)::BIGINT AS n_users
        |      FROM ud JOIN f USING (user_id)
        |      GROUP BY 1, 2),
        |sz AS (SELECT cohort_day, n_users AS cohort_n FROM c WHERE offset_days = 0)
        |SELECT c.cohort_day, c.offset_days, c.n_users,
        |  (1000 * c.n_users) // sz.cohort_n AS retention_permille
        |FROM c JOIN sz USING (cohort_day)""".stripMargin) { (s, dir) =>
      val ud = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
      val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val census = ud.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
        .agg(count(lit(1)).cast("bigint").as("n_users"))
      // every cohort has its own offset-0 row by construction (the
      // first active day IS an active day), so the size join is total
      val sizes = census.filter(col("offset_days") === 0)
        .select(col("cohort_day"), col("n_users").as("cohort_n"))
      census.join(broadcast(sizes), Seq("cohort_day"))
        .select(col("cohort_day"), col("offset_days"), col("n_users"),
          expr("(1000 * n_users) DIV cohort_n").as("retention_permille"))
    },

    // ----------------------------------------------------------------
    q("q254_activity_gini",
      """Activity-concentration audit — Gini coefficient (Gini 1912)
        |and top-decile Lorenz share of per-user event counts: the
        |inequality numbers behind every "power users" analysis (and a
        |training-data analog: contributor concentration in a crawl).
        |Gini needs every user's GLOBAL rank by activity — the textbook
        |formulation is a partition-less window, which PlanGuard
        |forbids; this query is the DistributedRank showcase instead:
        |exact global ranks from range-partitioned local ranks plus a
        |triangular prefix-sum join, no WindowExec with an empty
        |partitionSpec anywhere. With counts x_(1) <= ... <= x_(n),
        |G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) — all-BIGINT,
        |reported in micro units; the top-decile share is the n DIV 10
        |highest-ranked users' event share in permille (0 when n < 10:
        |floor semantics, pinned identically in both engines). Scale
        |shape: one user-keyed count with map-side combine, one
        |rank-shuffle over |users| rows, two 1-row aggregates joined by
        |broadcast. Ties break on (cnt, user_id) — total order, both
        |engines agree.""".stripMargin,
      """WITH uc AS (SELECT user_id, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1),
        |r AS (SELECT cnt,
        |    row_number() OVER (ORDER BY cnt, user_id) AS rk FROM uc),
        |m AS (SELECT count(*)::BIGINT AS n_users,
        |    CAST(sum(cnt) AS BIGINT) AS n_events,
        |    CAST(sum(rk * cnt) AS BIGINT) AS s_rx FROM r),
        |t AS (SELECT CAST(coalesce(sum(r.cnt), 0) AS BIGINT) AS top_cnt
        |  FROM r, m WHERE r.rk > m.n_users - m.n_users // 10)
        |SELECT m.n_users, m.n_events,
        |  (1000000 * (2 * m.s_rx - (m.n_users + 1) * m.n_events))
        |    // greatest(m.n_users * m.n_events, 1) AS gini_micro,
        |  (1000 * t.top_cnt) // greatest(m.n_events, 1) AS top_decile_share_pm
        |FROM m, t""".stripMargin) { (s, dir) =>
      val uc = Tables.events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).cast("bigint").as("cnt"))
      val r = DistributedRank.withGlobalRank(uc,
        Seq(col("cnt"), col("user_id")), "rk", "n_users")
      val m = r.agg(max(col("n_users")).as("n_users"),
        sum(col("cnt")).cast("bigint").as("n_events"),
        sum(expr("rk * cnt")).cast("bigint").as("s_rx"))
      val t = r.crossJoin(broadcast(m.select(col("n_users").as("nu"))))
        .filter(col("rk") > expr("nu - nu DIV 10"))
        .agg(coalesce(sum(col("cnt")), lit(0L)).cast("bigint").as("top_cnt"))
      m.crossJoin(broadcast(t))
        .select(col("n_users"), col("n_events"),
          expr("""(1000000 * (2 * s_rx - (n_users + 1) * n_events))
                 |DIV greatest(n_users * n_events, 1)""".stripMargin)
            .as("gini_micro"),
          expr("(1000 * top_cnt) DIV greatest(n_events, 1)")
            .as("top_decile_share_pm"))
    },

    // ----------------------------------------------------------------
    q("q263_markov2_lift",
      """Second-order Markov transition model with per-edge MEMORY-GAIN
        |lift — the model-selection question q150 (first-order matrix)
        |and q159 (top-path support mining) both leave open: does
        |remembering TWO steps of history change the next-step
        |prediction, and on which contexts? Per (t1, t2 → t3) triple
        |over the user (epoch micros, event_id) total order:
        |p2_pm = P(t3 | t1,t2) and p1_pm = P(t3 | t2) in permille,
        |both estimated on the SAME trigram-anchored positions (q150's
        |all-pairs estimate would mix in positions with no 2-history —
        |apples to oranges for the lift), and lift_milli = 1000 ·
        |P(t3|t1,t2) / P(t3|t2) — lift far from 1000 marks the edges
        |where second-order memory actually earns its state. The lift
        |cross-product runs in DECIMAL(19,0) (q157's discipline:
        |count × count × 1000 passes int64 near 1e9 rows). Scale
        |shape: ONE user-keyed window pass (both lags in one
        |projection → one Window operator), then every aggregate is
        |over ≤|types|³ census rows; the prefix/bigram marginals join
        |back as ≤25-row broadcasts.""".stripMargin,
      """WITH o AS (
        |  SELECT user_id,
        |    lag(event_type, 2) OVER w AS t1,
        |    lag(event_type, 1) OVER w AS t2,
        |    event_type AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |tr AS (SELECT t1, t2, t3 FROM o WHERE t1 IS NOT NULL),
        |c3 AS (SELECT t1, t2, t3, count(*)::BIGINT AS n3
        |       FROM tr GROUP BY 1, 2, 3),
        |c2 AS (SELECT t1, t2, CAST(sum(n3) AS BIGINT) AS n2
        |       FROM c3 GROUP BY 1, 2),
        |cb AS (SELECT t2, t3, count(*)::BIGINT AS nb FROM tr GROUP BY 1, 2),
        |ct AS (SELECT t2, CAST(sum(nb) AS BIGINT) AS nbt FROM cb GROUP BY 1)
        |SELECT c3.t1, c3.t2, c3.t3, c3.n3,
        |  (1000 * c3.n3) // c2.n2 AS p2_pm,
        |  (1000 * cb.nb) // ct.nbt AS p1_pm,
        |  CAST((1000 * CAST(c3.n3 AS HUGEINT) * ct.nbt)
        |       // (CAST(c2.n2 AS HUGEINT) * cb.nb) AS BIGINT) AS lift_milli
        |FROM c3 JOIN c2 USING (t1, t2) JOIN cb USING (t2, t3)
        |JOIN ct USING (t2)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochUs(col("ts")), col("event_id"))
      val tr = Tables.events(s, dir)
        .select(col("user_id"),
          // both lags in ONE projection so they plan as a single
          // Window operator (one sort, one pass — the q159 note)
          lag(col("event_type"), 2).over(w).as("t1"),
          lag(col("event_type"), 1).over(w).as("t2"),
          col("event_type").as("t3"))
        .filter(col("t1").isNotNull)
        .select(col("t1"), col("t2"), col("t3"))
        .transform(graft.Graft.stagedCheckpoint) // trigram + bigram census
      val c3 = tr.groupBy(col("t1"), col("t2"), col("t3"))
        .agg(count(lit(1)).cast("bigint").as("n3"))
      val c2 = c3.groupBy(col("t1"), col("t2"))
        .agg(sum(col("n3")).cast("bigint").as("n2"))
      val cb = tr.groupBy(col("t2"), col("t3"))
        .agg(count(lit(1)).cast("bigint").as("nb"))
      val ct = cb.groupBy(col("t2"))
        .agg(sum(col("nb")).cast("bigint").as("nbt"))
      c3.join(broadcast(c2), Seq("t1", "t2"))
        .join(broadcast(cb), Seq("t2", "t3"))
        .join(broadcast(ct), Seq("t2"))
        .select(col("t1"), col("t2"), col("t3"), col("n3"),
          expr("(1000 * n3) DIV n2").as("p2_pm"),
          expr("(1000 * nb) DIV nbt").as("p1_pm"),
          expr("""CAST((1000 * CAST(n3 AS DECIMAL(19,0)) * nbt)
                 |     DIV (CAST(n2 AS DECIMAL(19,0)) * nb) AS BIGINT)""".stripMargin)
            .as("lift_milli"))
    },

    // ----------------------------------------------------------------
    q("q264_transition_latency",
      """Transition LATENCY matrix — q150's Markov transitions with the
        |time dimension the count matrix throws away: per (prev_type →
        |next_type) pair, exact p50/p90/max of the gap between the two
        |events in whole seconds, plus the mean — how LONG each edge of
        |the behavioral graph takes, the number a UX/SLA review reads
        |next to the transition probability. Percentiles are exact by
        |the q202 histogram-inversion discipline on the second-valued
        |gap domain: the cumulative window partitions by the type PAIR
        |and runs over per-pair gap histograms bounded by the event
        |horizon in seconds — never by event count. Scale shape: ONE
        |user-keyed window pass (q150's lag, plus the timestamp carried
        |alongside), one (pair, gap) histogram shuffle with map-side
        |combine, a ≤|types|² roll-up. Mean is a floor division of
        |exact sums.""".stripMargin,
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events),
        |g AS (SELECT prev_type, event_type AS next_type,
        |        gap_us // 1000000 AS gap_s
        |      FROM o WHERE prev_type IS NOT NULL),
        |hist AS (SELECT prev_type, next_type, gap_s, count(*)::BIGINT AS cnt
        |         FROM g GROUP BY 1, 2, 3),
        |h2 AS (
        |  SELECT prev_type, next_type, gap_s, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY prev_type, next_type
        |      ORDER BY gap_s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY prev_type, next_type) AS BIGINT) AS n
        |  FROM hist)
        |SELECT prev_type, next_type, max(n) AS n_transitions,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN gap_s END) AS p50_s,
        |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap_s END) AS p90_s,
        |  max(gap_s) AS max_s,
        |  CAST(sum(gap_s * cnt) AS BIGINT) // max(n) AS mean_s
        |FROM h2 GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(epochUs(col("ts")), col("event_id"))
      val hist = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("gap_us", epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"),
          expr("gap_us DIV 1000000").as("gap_s"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      val cum = Window.partitionBy(col("prev_type"), col("next_type"))
        .orderBy(col("gap_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("prev_type"), col("next_type"))
      hist
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("prev_type"), col("next_type"))
        .agg(max(col("n")).as("n_transitions"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("gap_s"))).as("p50_s"),
          min(when(expr("cum >= (9 * n + 9) DIV 10"), col("gap_s"))).as("p90_s"),
          max(col("gap_s")).as("max_s"),
          expr("CAST(sum(gap_s * cnt) AS BIGINT) DIV max(n)").as("mean_s"))
    },

    // ----------------------------------------------------------------
    q("q265_session_concurrency",
      """Concurrent-session curve — capacity planning's first chart:
        |per clock hour, how many of q21's gap-rule sessions are OPEN
        |(span the hour), how many start, how many end, and how many
        |distinct users they belong to. Sessions come from q21's exact
        |two-window pattern (one shuffle, one sort — same 2h gap rule,
        |so the curve reconciles with the session catalog row for row);
        |each session then explodes to its [start_hour, end_hour] span
        |— bounded by the session's own wall-clock length in hours
        |(horizon-capped), NOT by its event count, so a bot session
        |with 1e8 events in one hour costs ONE row here. The hourly
        |census is an hour-keyed agg with map-side combine; state is
        |the active-hour spine, never the event stream. This is the
        |interval-overlap count done without a partition-less
        |boundary-sweep window — the explode trades horizon-bounded
        |rows for the global cumulative sum the +1/−1 formulation
        |would need.""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
        |         OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, session_id,
        |    min(epoch_us(ts) // 1000000) // 3600 AS sh,
        |    max(epoch_us(ts) // 1000000) // 3600 AS eh
        |  FROM s GROUP BY 1, 2),
        |x AS (SELECT user_id, sh, eh, unnest(generate_series(sh, eh)) AS h
        |      FROM sess)
        |SELECT h AS epoch_hour, count(*)::BIGINT AS n_active,
        |  CAST(sum(CASE WHEN h = sh THEN 1 ELSE 0 END) AS BIGINT) AS n_starting,
        |  CAST(sum(CASE WHEN h = eh THEN 1 ELSE 0 END) AS BIGINT) AS n_ending,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM x GROUP BY 1""".stripMargin) { (s, dir) =>
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(byTs)
      Tables.events(s, dir)
        .withColumn("brk", when(gap > 7200000000L || gap.isNull, 1).otherwise(0))
        .withColumn("session_id", sum(col("brk")).over(
          byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(expr("min(unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000) DIV 3600").as("sh"),
          expr("max(unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000) DIV 3600").as("eh"))
        .select(col("user_id"), col("sh"), col("eh"),
          explode(expr("sequence(sh, eh)")).as("epoch_hour"))
        .groupBy(col("epoch_hour"))
        .agg(count(lit(1)).cast("bigint").as("n_active"),
          sum(when(col("epoch_hour") === col("sh"), 1L).otherwise(0L))
            .cast("bigint").as("n_starting"),
          sum(when(col("epoch_hour") === col("eh"), 1L).otherwise(0L))
            .cast("bigint").as("n_ending"),
          countDistinct(col("user_id")).cast("bigint").as("n_users"))
    },

    // ----------------------------------------------------------------
    q("q266_funnel_latency",
      """Funnel TIME-TO-CONVERT by entry cohort — the duration
        |dimension the depth censuses (q112/q121) discard: per first-
        |'view' day, how many users entered the strict FIRST-TOUCH
        |chain (first view, first click AFTER it, first purchase after
        |THAT — the attribution-grade chain semantics, deliberately
        |distinct from q112's greedy earliest-completion subsequence,
        |which may complete where the first-touch chain stalls), how
        |many completed, and exact p50/p90 completion seconds via the
        |q202 histogram inversion on the duration domain, partitioned
        |by cohort day. Scale shape: the three chained mins are three
        |aggregates over the SAME user-hash-partitioned staged event
        |slice (each join lands co-partitioned — the corpus shuffles
        |once, at the staging repartition); the percentile windows run
        |over day-partitioned duration histograms bounded by the
        |horizon in seconds, never by user count.""".stripMargin,
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |e1 AS (SELECT user_id, min(us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |e2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev JOIN e1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        |e3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev JOIN e2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
        |c AS (SELECT e1.user_id, t1 // 86400000000 AS day,
        |        (t3 - t1) // 1000000 AS dur_s
        |      FROM e1 LEFT JOIN e3 USING (user_id)),
        |ent AS (SELECT day, count(*)::BIGINT AS n_entered,
        |          CAST(sum(CASE WHEN dur_s IS NOT NULL THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n_completed
        |        FROM c GROUP BY 1),
        |hist AS (SELECT day, dur_s, count(*)::BIGINT AS cnt
        |         FROM c WHERE dur_s IS NOT NULL GROUP BY 1, 2),
        |h2 AS (SELECT day, dur_s, cnt,
        |         CAST(sum(cnt) OVER (PARTITION BY day ORDER BY dur_s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum,
        |         CAST(sum(cnt) OVER (PARTITION BY day) AS BIGINT) AS n
        |       FROM hist),
        |p AS (SELECT day,
        |        min(CASE WHEN cum >= (n + 1) // 2 THEN dur_s END) AS p50_s,
        |        min(CASE WHEN cum >= (9 * n + 9) // 10 THEN dur_s END) AS p90_s
        |      FROM h2 GROUP BY 1)
        |SELECT ent.day, ent.n_entered, ent.n_completed, p.p50_s, p.p90_s
        |FROM ent LEFT JOIN p USING (day)""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_type"),
          epochUs(col("ts")).as("us"))
        .repartition(col("user_id")) // every agg/join below rides this
        .transform(graft.Graft.stagedCheckpoint)
      val e1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
      val e2 = ev.filter(col("event_type") === "click")
        .join(e1, Seq("user_id")).filter(col("us") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
      val e3 = ev.filter(col("event_type") === "purchase")
        .join(e2, Seq("user_id")).filter(col("us") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
      val c = e1.join(e3, Seq("user_id"), "left")
        .select(expr("t1 DIV 86400000000").as("day"),
          expr("(t3 - t1) DIV 1000000").as("dur_s"))
      val ent = c.groupBy(col("day"))
        .agg(count(lit(1)).cast("bigint").as("n_entered"),
          sum(when(col("dur_s").isNotNull, 1L).otherwise(0L))
            .cast("bigint").as("n_completed"))
      val cum = Window.partitionBy(col("day")).orderBy(col("dur_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("day"))
      val p = c.filter(col("dur_s").isNotNull)
        .groupBy(col("day"), col("dur_s"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("day"))
        .agg(min(when(expr("cum >= (n + 1) DIV 2"), col("dur_s"))).as("p50_s"),
          min(when(expr("cum >= (9 * n + 9) DIV 10"), col("dur_s"))).as("p90_s"))
      ent.join(p, Seq("day"), "left")
        .select(col("day"), col("n_entered"), col("n_completed"),
          col("p50_s"), col("p90_s"))
    },

    // ----------------------------------------------------------------
    q("q267_theil_decomposition",
      """Theil T inequality index of event spend, DECOMPOSED — the
        |property that makes economists reach past Gini (q157/q254
        |report concentration but cannot say WHERE it lives): T =
        |T_between + T_within splits inequality into the share
        |explained by event-type group means vs the share inside the
        |groups (Theil 1967; Shorrocks 1980 on decomposability). The
        |log that kept this family out of reach is q256's
        |shared-constant quantized dyadic log2:
        |T·S = Σx·log2(x) − S·log2(S/n) runs term-exact in micro-bits
        |with Σx·log2(x) accumulated in DECIMAL(38,0) (cents ×
        |micro-bits passes int64 near 1e9 rows — q157's discipline;
        |decimal sums are order-independent, so the result is
        |bit-identical under any partitioning), and T_between needs
        |only the ≤|types| group (n_g, S_g) pairs. Output in
        |micro-bits of entropy (×ln2 for nats): total, between,
        |within = total − between, over positive-cent events (Theil
        |is defined on positive values — the filter IS the
        |definition). Scale shape: one |types|-group partial agg over
        |the scan, a ≤|types|-row roll-up, zero joins, zero
        |windows.""".stripMargin, {
        import TextOps.{log2MicroDuck => ld}
        s"""WITH c AS (
          |  SELECT event_type,
          |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          |  FROM events
          |  WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) >= 1),
          |g AS (
          |  SELECT event_type, count(*)::BIGINT AS ng,
          |    CAST(sum(cents) AS BIGINT) AS sg,
          |    sum(CAST(cents AS HUGEINT) * ${ld("cents")}) AS rg
          |  FROM c GROUP BY 1),
          |t AS (
          |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
          |    sum(rg) AS r,
          |    sum(CAST(sg AS HUGEINT) * (${ld("sg")} - ${ld("ng")})) AS b
          |  FROM g)
          |SELECT n, s AS total_cents,
          |  CAST(r // CAST(s AS HUGEINT) AS BIGINT) - ${ld("s")} + ${ld("n")}
          |    AS theil_micro,
          |  CAST(b // CAST(s AS HUGEINT) AS BIGINT) - ${ld("s")} + ${ld("n")}
          |    AS between_micro,
          |  (CAST(r // CAST(s AS HUGEINT) AS BIGINT) - ${ld("s")} + ${ld("n")})
          |  - (CAST(b // CAST(s AS HUGEINT) AS BIGINT) - ${ld("s")} + ${ld("n")})
          |    AS within_micro
          |FROM t""".stripMargin
      }) { (s, dir) =>
      import TextOps.{log2MicroSpark => ls}
      val c = Tables.events(s, dir)
        .select(col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .filter(col("cents") >= 1)
      val g = c.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("ng"),
          sum(col("cents")).cast("bigint").as("sg"),
          sum(expr(s"CAST(cents AS DECIMAL(19,0)) * ${ls("cents")}"))
            .cast("decimal(38,0)").as("rg"))
      g.agg(sum(col("ng")).cast("bigint").as("n"),
          sum(col("sg")).cast("bigint").as("s"),
          sum(col("rg")).cast("decimal(38,0)").as("r"),
          sum(expr(s"CAST(sg AS DECIMAL(19,0)) * (${ls("sg")} - ${ls("ng")})"))
            .cast("decimal(38,0)").as("b"))
        .select(col("n"), col("s").as("total_cents"),
          expr(s"""CAST(r DIV CAST(s AS DECIMAL(19,0)) AS BIGINT)
                  | - ${ls("s")} + ${ls("n")}""".stripMargin).as("theil_micro"),
          expr(s"""CAST(b DIV CAST(s AS DECIMAL(19,0)) AS BIGINT)
                  | - ${ls("s")} + ${ls("n")}""".stripMargin).as("between_micro"),
          expr(s"""(CAST(r DIV CAST(s AS DECIMAL(19,0)) AS BIGINT) - ${ls("s")} + ${ls("n")})
                  | - (CAST(b DIV CAST(s AS DECIMAL(19,0)) AS BIGINT) - ${ls("s")} + ${ls("n")})""".stripMargin)
            .as("within_micro"))
    })

  /** Zero-filled hourly count spine over an arbitrary (event_type, ts)
    * frame, shared by the control-chart pair (q225 EWMA via
    * [[ewmaChart]], q227 CUSUM via [[cusumChart]]) and driven directly
    * by their streaming twins' stream ≡ batch proofs: one (type, hour)
    * histogram shuffle with map-side combine, then each type's
    * integer-hour range exploded (bounded by types × wall-clock hours,
    * never event count) and left-joined so gap hours are REAL zero
    * observations — both charts treat silence as evidence, and
    * lag/prefix windows over the raw aggregate would silently compress
    * quiet periods. */
  private[graft] def hourlySpineOf(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    val sp = c.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
    sp.join(c, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** q227's per-type CUSUM target: the zero-filled spine mean in milli
    * units. Shared by batch [[cusumChart]] and (as the trained
    * reference the online half consumes, the StreamBuckets
    * train-batch/serve-stream pattern) the StreamCusum spec. */
  private[graft] def cusumMu(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    hourlySpineOf(events).groupBy(col("event_type"))
      .agg(expr("(1000 * CAST(sum(cnt) AS BIGINT)) DIV count(1)").as("mu_milli"))

  /** q227's CUSUM chart as a frame transform over (event_type, ts) —
    * shared by batch q227 and the streaming twin
    * ([[graft.streaming.StreamCusum]]); the stream ≡ batch proof covers
    * this exact code path. */
  private[graft] def cusumChart(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val z = hourlySpineOf(events)
    z.join(broadcast(cusumMu(events)), Seq("event_type"))
      .withColumn("y_milli",
        lit(1000) * col("cnt") - col("mu_milli") - expr("mu_milli DIV 4"))
      .withColumn("pre", sum(col("y_milli")).over(w).cast("bigint"))
      .withColumn("mn", min(col("pre")).over(w).cast("bigint"))
      .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"),
        (col("pre") - least(lit(0L), col("mn"))).as("cusum_milli"),
        (lit(8) * col("mu_milli")).as("thresh_milli"),
        when(col("pre") - least(lit(0L), col("mn")) > lit(8) * col("mu_milli"), 1)
          .otherwise(0).as("alarm"))
  }

  /** q225's EWMA chart as a frame transform over (event_type, ts) —
    * shared by batch q225 and the streaming twin
    * ([[graft.streaming.StreamEwma]]); the stream ≡ batch proof covers
    * this exact code path. */
  private[graft] def ewmaChart(
      events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val lagged = (1 to 16).foldLeft(hourlySpineOf(events)) { (df, k) =>
      df.withColumn(s"l$k", lag(col("cnt"), k).over(w))
    }
    val wExpr = (1 to 16).map(k => s"${1L << (16 - k)} * l$k").mkString(" + ")
    lagged.filter(col("l16").isNotNull)
      .select(col("event_type"), col("h").as("epoch_hour"), col("cnt"),
        expr(s"CAST($wExpr AS BIGINT)").as("baseline_num"),
        expr(s"(1000 * ($wExpr)) DIV 65535").as("baseline_milli"),
        expr(s"CASE WHEN cnt * 65535 > 2 * ($wExpr) THEN 1 ELSE 0 END")
          .as("spike_flag"))
  }

  /** q149's kernel, shared with the streaming twin's stream ≡ batch
    * proof (StreamAnomalySpec) and the spike-fixture spec: per event,
    * the count/sum/sum-of-squares of the user's PRIOR 6-hour frame
    * (exclusive of the event and its timestamp peers) and the cleared
    * integer z-test dev2 = (n·x−S)² vs thr = 9(n·Q−S²). Input needs
    * (event_id, user_id, ts, value). */
  def rollingAnomaly(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val e = events
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val win = Window.partitionBy(col("user_id"))
      .orderBy(epochUs(col("ts")))
      .rangeBetween(-21600000000L, -1)
    val dev2 = (col("n") * col("cents") - col("s")) * (col("n") * col("cents") - col("s"))
    val thr = lit(9L) * (col("n") * col("q") - col("s") * col("s"))
    e.select(col("event_id"), col("user_id"), col("cents"),
        count(lit(1)).over(win).as("n"),
        coalesce(sum(col("cents")).over(win), lit(0L)).cast("long").as("s"),
        coalesce(sum(col("cents") * col("cents")).over(win), lit(0L)).cast("long").as("q"))
      .select(col("event_id"), col("user_id"),
        col("n").cast("long").as("n_frame"),
        dev2.as("dev2"), thr.as("thr"),
        ((col("n") >= 5) && (dev2 > thr)).cast("int").as("anomaly"))
  }
}
