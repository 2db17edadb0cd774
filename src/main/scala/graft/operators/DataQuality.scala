package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** Data-quality tier — the Deequ-class checks (Schelter et al., VLDB
  * 2018, "Automating large-scale data quality verification") every
  * production pipeline runs BEFORE the analytics in this catalog are
  * allowed to read a drop: a per-column statistical profile and a
  * declarative constraint battery, both as ordinary oracle-gated
  * queries so the checks themselves are cross-engine verified.
  *
  * Scale shape: the profiler is ONE pass over the fact table (a single
  * aggregate; the exact distinct counts plan as one Expand — ×k rows
  * map-side, collapsing immediately into partial aggregates, the
  * standard multi-count-distinct trade); the constraint battery is
  * scan-side predicates plus two referential anti-joins that Catalyst
  * sizes (broadcast at dim scale, shuffled-hash past it). Output is
  * rows-per-COLUMN / rows-per-CHECK — constant-sized regardless of
  * corpus.
  */
object DataQuality {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q271_column_profile",
      """Per-column statistical profile of the events fact table — the
        |Deequ/Glue-DataBrew profiler shape: for every column, row
        |count, null count, exact distinct count, and typed min/max
        |(numerics in exact BIGINT units — micros for ts, cents for
        |value; strings lexicographic, which ASCII test data keeps
        |binary-collation-identical cross-engine). One pass: a single
        |aggregate computes all six columns' statistics (the distinct
        |counts share one Expand), then the 1-row result unpivots to
        |a row per column via stack — no second scan, no window.
        |Profile-before-read is the operational contract: q270 names
        |the shuffle risk, this names the content risk (nulls where
        |joins expect keys, cardinality collapse, range drift).""".stripMargin,
      """WITH s AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(count(event_id) AS BIGINT) AS nn_id,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS nd_id,
        |    CAST(min(event_id) AS BIGINT) AS mn_id,
        |    CAST(max(event_id) AS BIGINT) AS mx_id,
        |    CAST(count(ts) AS BIGINT) AS nn_ts,
        |    CAST(count(DISTINCT ts) AS BIGINT) AS nd_ts,
        |    CAST(min(epoch_us(ts)) AS BIGINT) AS mn_ts,
        |    CAST(max(epoch_us(ts)) AS BIGINT) AS mx_ts,
        |    CAST(count(user_id) AS BIGINT) AS nn_u,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS nd_u,
        |    CAST(min(user_id) AS BIGINT) AS mn_u,
        |    CAST(max(user_id) AS BIGINT) AS mx_u,
        |    CAST(count(event_type) AS BIGINT) AS nn_t,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS nd_t,
        |    min(event_type) AS mns_t, max(event_type) AS mxs_t,
        |    CAST(count(value) AS BIGINT) AS nn_v,
        |    CAST(count(DISTINCT value) AS BIGINT) AS nd_v,
        |    CAST(min(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mn_v,
        |    CAST(max(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mx_v,
        |    CAST(count(props) AS BIGINT) AS nn_p,
        |    CAST(count(DISTINCT props) AS BIGINT) AS nd_p,
        |    min(props) AS mns_p, max(props) AS mxs_p
        |  FROM events)
        |SELECT 'event_id' AS column_name, n, n - nn_id AS n_null,
        |  nd_id AS n_distinct, mn_id AS min_num, mx_id AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        |FROM s
        |UNION ALL SELECT 'ts', n, n - nn_ts, nd_ts, mn_ts, mx_ts, NULL, NULL FROM s
        |UNION ALL SELECT 'user_id', n, n - nn_u, nd_u, mn_u, mx_u, NULL, NULL FROM s
        |UNION ALL SELECT 'event_type', n, n - nn_t, nd_t, NULL, NULL, mns_t, mxs_t FROM s
        |UNION ALL SELECT 'value', n, n - nn_v, nd_v, mn_v, mx_v, NULL, NULL FROM s
        |UNION ALL SELECT 'props', n, n - nn_p, nd_p, NULL, NULL, mns_p, mxs_p FROM s""".stripMargin) { (s, dir) =>
      val one = Tables.events(s, dir).agg(
        count(lit(1)).cast("bigint").as("n"),
        count(col("event_id")).cast("bigint").as("nn_id"),
        countDistinct(col("event_id")).cast("bigint").as("nd_id"),
        min(col("event_id")).cast("bigint").as("mn_id"),
        max(col("event_id")).cast("bigint").as("mx_id"),
        count(col("ts")).cast("bigint").as("nn_ts"),
        countDistinct(col("ts")).cast("bigint").as("nd_ts"),
        expr("CAST(min(unix_micros(CAST(ts AS TIMESTAMP))) AS BIGINT)").as("mn_ts"),
        expr("CAST(max(unix_micros(CAST(ts AS TIMESTAMP))) AS BIGINT)").as("mx_ts"),
        count(col("user_id")).cast("bigint").as("nn_u"),
        countDistinct(col("user_id")).cast("bigint").as("nd_u"),
        min(col("user_id")).cast("bigint").as("mn_u"),
        max(col("user_id")).cast("bigint").as("mx_u"),
        count(col("event_type")).cast("bigint").as("nn_t"),
        countDistinct(col("event_type")).cast("bigint").as("nd_t"),
        min(col("event_type")).as("mns_t"),
        max(col("event_type")).as("mxs_t"),
        count(col("value")).cast("bigint").as("nn_v"),
        countDistinct(col("value")).cast("bigint").as("nd_v"),
        min(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("mn_v"),
        max(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("mx_v"),
        count(col("props")).cast("bigint").as("nn_p"),
        countDistinct(col("props")).cast("bigint").as("nd_p"),
        min(col("props")).as("mns_p"),
        max(col("props")).as("mxs_p"))
      one.select(expr(
        """stack(6,
          |  'event_id', n - nn_id, nd_id, mn_id, mx_id, CAST(NULL AS STRING), CAST(NULL AS STRING),
          |  'ts',       n - nn_ts, nd_ts, mn_ts, mx_ts, CAST(NULL AS STRING), CAST(NULL AS STRING),
          |  'user_id',  n - nn_u,  nd_u,  mn_u,  mx_u,  CAST(NULL AS STRING), CAST(NULL AS STRING),
          |  'event_type', n - nn_t, nd_t, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mns_t, mxs_t,
          |  'value',    n - nn_v,  nd_v,  mn_v,  mx_v,  CAST(NULL AS STRING), CAST(NULL AS STRING),
          |  'props',    n - nn_p,  nd_p,  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), mns_p, mxs_p
          |) AS (column_name, n_null, n_distinct, min_num, max_num, min_str, max_str)""".stripMargin),
        col("n"))
        .select(col("column_name"), col("n"), col("n_null"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    },

    // ----------------------------------------------------------------
    q("q272_dq_checks",
      """Declarative constraint battery — the Deequ check suite as a
        |query: per named constraint, rows checked, violations found,
        |and the pass flag. Six checks spanning the three constraint
        |classes: UNIQUENESS (event_id is a key), REFERENTIAL
        |INTEGRITY (lineitem→orders and orders→customer foreign keys,
        |as anti-join counts — the exact predicate a fact-dim join
        |silently drops rows on), and DOMAIN rules (value >= 0,
        |o_totalprice > 0, ts non-null). Violations are counted, not
        |sampled, and never abort — a quality gate reports, the
        |pipeline decides. Scale shape: uniqueness is one exact
        |distinct over the key; the two anti-joins are key-only
        |projections Catalyst sizes (broadcast at dim scale, shuffled
        |hash past it); domain rules are scan-side sums fused into
        |single-pass aggregates; output is exactly 6 rows.""".stripMargin,
      """WITH u AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_ids,
        |    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
        |    CAST(sum(CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) < 0
        |             THEN 1 ELSE 0 END) AS BIGINT) AS neg_value
        |  FROM events),
        |li AS (SELECT count(*)::BIGINT AS n_li,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans
        |       FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |oc AS (SELECT count(*)::BIGINT AS n_o,
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans,
        |         CAST(sum(CASE WHEN CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) <= 0
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS nonpos
        |       FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey)
        |SELECT 'events.event_id unique' AS check_name, u.n AS n_checked,
        |  u.dup_ids AS n_violations,
        |  CAST(CASE WHEN u.dup_ids = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM u
        |UNION ALL SELECT 'events.ts not null', u.n, u.null_ts,
        |  CAST(CASE WHEN u.null_ts = 0 THEN 1 ELSE 0 END AS BIGINT) FROM u
        |UNION ALL SELECT 'events.value >= 0', u.n, u.neg_value,
        |  CAST(CASE WHEN u.neg_value = 0 THEN 1 ELSE 0 END AS BIGINT) FROM u
        |UNION ALL SELECT 'lineitem.l_orderkey -> orders', li.n_li, li.orphans,
        |  CAST(CASE WHEN li.orphans = 0 THEN 1 ELSE 0 END AS BIGINT) FROM li
        |UNION ALL SELECT 'orders.o_custkey -> customer', oc.n_o, oc.orphans,
        |  CAST(CASE WHEN oc.orphans = 0 THEN 1 ELSE 0 END AS BIGINT) FROM oc
        |UNION ALL SELECT 'orders.o_totalprice > 0', oc.n_o, oc.nonpos,
        |  CAST(CASE WHEN oc.nonpos = 0 THEN 1 ELSE 0 END AS BIGINT) FROM oc""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).agg(
        count(lit(1)).cast("bigint").as("n"),
        (count(lit(1)) - countDistinct(col("event_id"))).cast("bigint").as("dup_ids"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).cast("bigint").as("null_ts"),
        sum(when(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)") < 0, 1L)
          .otherwise(0L)).cast("bigint").as("neg_value"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left")
        .agg(count(lit(1)).cast("bigint").as("n_li"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
            .cast("bigint").as("orphans"))
      val oc = Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
        .join(Tables.customer(s, dir).select(col("c_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .agg(count(lit(1)).cast("bigint").as("n_o"),
          sum(when(col("c_custkey").isNull, 1L).otherwise(0L))
            .cast("bigint").as("orphans"),
          sum(when(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)") <= 0, 1L)
            .otherwise(0L)).cast("bigint").as("nonpos2"))
      // each aggregate runs ONCE: the three 1-row frames cross-join and
      // the 6 report rows stack out of that single row (a union of six
      // row() selects would re-run every aggregate per branch)
      ev.crossJoin(broadcast(li)).crossJoin(broadcast(oc.withColumnRenamed("orphans", "orphans2")))
        .select(expr(
          """stack(6,
            |  'events.event_id unique',        n,    dup_ids,
            |  'events.ts not null',            n,    null_ts,
            |  'events.value >= 0',             n,    neg_value,
            |  'lineitem.l_orderkey -> orders', n_li, orphans,
            |  'orders.o_custkey -> customer',  n_o,  orphans2,
            |  'orders.o_totalprice > 0',       n_o,  nonpos2
            |) AS (check_name, n_checked, n_violations)""".stripMargin))
        .select(col("check_name"), col("n_checked"), col("n_violations"),
          when(col("n_violations") === 0L, 1L).otherwise(0L)
            .cast("bigint").as("pass"))
    })
}
