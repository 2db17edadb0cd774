package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second ring of the SQL surface: frame-window aggregates, CUBE,
  * navigation functions, exact percentiles, multi-partition union scans,
  * LIKE/regexp predicates. Everything a user of the reference's Athena
  * tier could type that the first ring didn't cover.
  */
object AdvancedOps {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q37_moving_avg",
      """Frame-window moving aggregate: per-user 3-row moving average of
        |value (exact decimal sum over the frame, one double division).
        |Shares the (user, ts) shuffle+sort with every other per-user
        |window — Catalyst plans ONE exchange for all frames on the same
        |spec.""".stripMargin,
      """SELECT user_id, event_id,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |       / count(value) OVER w AS DOUBLE) AS mavg3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir).select(
        col("user_id"), col("event_id"),
        (sum(dec(col("value"))).over(w).cast("double") / count(col("value")).over(w))
          .cast("double").as("mavg3"))
    },

    // ----------------------------------------------------------------
    q("q38_cube",
      """CUBE over (region, order status): all 4 grouping combinations in
        |one Expand+HashAggregate pass — the full OLAP rollup surface
        |beyond q9's ROLLUP.""".stripMargin,
      """SELECT r_name, o_orderstatus,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, o_orderstatus)""".stripMargin) { (s, dir) =>
      val dims = Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      Tables.orders(s, dir)
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .cube(col("r_name"), col("o_orderstatus"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n"))
    },

    // ----------------------------------------------------------------
    q("q39_window_nav",
      """Navigation window functions: per-user first/last event type over
        |the full frame (unbounded both sides). One row per user via
        |distinct — both frames share the same sort.""".stripMargin,
      """SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  count(*) OVER w AS n_events
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir).select(
        col("user_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        count(lit(1)).over(w).as("n_events")).distinct()
    },

    // ----------------------------------------------------------------
    q("q40_percentiles",
      """Exact discrete percentiles (median, p90) per event type —
        |percentile_disc picks an actual element, so results are
        |bit-identical across engines with no interpolation arithmetic.
        |The approx path at scale is approx_percentile/HLL-style sketches;
        |disc is the oracle-checkable baseline.""".stripMargin,
      """SELECT event_type,
        |  quantile_disc(value, 0.5) AS p50,
        |  quantile_disc(value, 0.9) AS p90,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)").as("p90"),
          count(lit(1)).as("n"))
    },

    // ----------------------------------------------------------------
    q("q41_union_partition_scan",
      """Multi-partition union scan (the S1 multi-hour shape): two
        |disjoint date-range scans unioned then aggregated. Each branch
        |pushes its own range predicate to the scan; at scale these are
        |disjoint partition sets read in one pass.""".stripMargin,
      """SELECT src, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM (
        |  SELECT 'y1996' AS src, l_quantity FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  UNION ALL
        |  SELECT 'y1997' AS src, l_quantity FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY src""".stripMargin) { (s, dir) =>
      def slice(tag: String, lo: String, hi: String) =
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit(lo).cast("timestamp"))
          .filter(col("l_shipdate") < lit(hi).cast("timestamp"))
          .select(lit(tag).as("src"), col("l_quantity"))
      slice("y1996", "1996-01-01 00:00:00", "1997-01-01 00:00:00")
        .unionByName(slice("y1997", "1997-01-01 00:00:00", "1998-01-01 00:00:00"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
    },

    // ----------------------------------------------------------------
    q("q44_asof_join",
      """As-of join — each purchase matched to the user's most recent
        |signup at-or-before it. Spark lacks a native ASOF operator;
        |per the extension ladder this composes existing ops: tag both
        |sides, union, and carry the last signup time forward with one
        |running window (partition user, order ts with signups sorting
        |first on ties). ONE shuffle+sort total — cheaper than the
        |classic equi-join + per-pair filter + argmax, which shuffles
        |twice and blows up on hot users. DuckDB's native ASOF JOIN is
        |the oracle.""".stripMargin,
      """SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_us,
        |  epoch_us(s.ts) AS signup_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("side"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("side"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(signups)
        .withColumn("signup_us",
          last(when(col("side") === 0, epochUs(col("ts"))), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"),
          epochUs(col("ts")).as("purchase_us"), col("signup_us"))
    },

    // ----------------------------------------------------------------
    q("q43_approx_sketches",
      """The sketch tier for 100 TB cardinalities: HyperLogLog++ distinct
        |counts and quantile sketches per event type. Sketches are
        |mergeable across partitions (one shuffle of fixed-size state, no
        |matter the row count) — the scale path behind q12/q40's exact
        |baselines. Sketch internals are engine-specific, so the query
        |validates itself: it emits the exact values beside tolerance
        |verdicts — HLL within 10% of exact countDistinct (5 sigma at
        |rsd=0.02), approx p50 between the exact p40/p60 discrete
        |quantiles — and the oracle asserts the exact values and that
        |every verdict is true. A broken sketch turns the row red.
        |Scale shape of the SELF-VALIDATION baselines (VERDICT r15 #1 —
        |the pre-r16 version put exact percentile_disc and an exact
        |countDistinct in the SAME aggregate as the sketches, forcing
        |sort-based aggregation over every raw value per group plus an
        |Expand: measured ×19 superlinear, 1.6 s at sf0.1 → 32.7 s
        |isolated at sf1). Now every exact baseline is its own linear
        |shape: exact_users = two-level hash agg on (type, user) — no
        |Expand; exact p40/p60 = histogram inversion over the VALUE
        |DOMAIN (the q40/q202 discipline: one (type, value) hash
        |histogram with map-side combine, cumulative window over
        |distinct values only — bounded by the domain, not the row
        |count); sketches + n ride one linear hash-agg pass. The three
        |5-row per-type frames join at the end. Same output, same
        |oracle, near-linear at any SF.""".stripMargin,
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS hll_ok,
        |  TRUE AS p50_ok,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      // sketches + row count: ONE linear (ObjectHash) agg pass — the
      // part of this query a 100 TB job actually ships
      val sk = ev.groupBy(col("event_type")).agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_p50"),
        count(lit(1)).as("n"))
      // exact distinct users: distinct pairs then count — two hash
      // shuffles, both with map-side partial agg, no Expand
      val exact = ev.select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type")).agg(count(lit(1)).as("exact_users"))
      // exact p40/p60 via histogram inversion (q40/q202 discipline):
      // cum >= ceil(q*nn) over the per-type value histogram picks the
      // same element percentile_disc does (cume_dist >= q), with the
      // window running over DISTINCT values only. NULL values are
      // excluded exactly as percentile_disc excludes them.
      val hist = ev.filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("cnt"))
      val cumW = Window.partitionBy(col("event_type")).orderBy(col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wholeW = Window.partitionBy(col("event_type"))
      val pct = hist
        .withColumn("cum", sum(col("cnt")).over(cumW).cast("long"))
        .withColumn("nn", sum(col("cnt")).over(wholeW).cast("long"))
        .groupBy(col("event_type"))
        .agg(min(when(expr("cum >= (2 * nn + 4) DIV 5"), col("value"))).as("p40"),
          min(when(expr("cum >= (3 * nn + 4) DIV 5"), col("value"))).as("p60"))
      sk.join(exact, Seq("event_type"))
        .join(pct, Seq("event_type"))
        .select(
          col("event_type"),
          col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double")
            / col("exact_users") <= 0.10).as("hll_ok"),
          col("approx_p50").between(col("p40"), col("p60")).as("p50_ok"),
          col("n"))
    },

    // ----------------------------------------------------------------
    q("q42_like_regexp",
      """LIKE / regexp predicate pushdown surface: widget parts by brand
        |pattern, with a regexp-extracted brand number. StartsWith/Contains
        |push to the parquet scan; the regexp runs post-scan in
        |codegen.""".stripMargin,
      """SELECT p_partkey, p_name, p_brand,
        |  TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS BIGINT) AS brand_num
        |FROM part
        |WHERE p_name LIKE '%widget%' AND p_type LIKE 'ECONOMY%'""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_name").like("%widget%") && col("p_type").like("ECONOMY%"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).cast("bigint").as("brand_num"))
    })
}
