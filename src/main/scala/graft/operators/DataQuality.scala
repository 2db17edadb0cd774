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

  /** q289's LinearCounting table: ln(256/V) for V = 1..256 in integer
    * micro-nats, computed once and interpolated into BOTH engine
    * programs (the q153 shared-constant discipline, at m = 256). */
  private val hllLn256Micro: IndexedSeq[Long] =
    (1 to 256).map(v => math.round(math.log(256.0 / v) * 1e6))

  /** alpha_256 = 0.7213/(1 + 1.079/256) = 0.71827 (Flajolet et al.
    * 2007, Fig. 3), entered as the rational 71827/100000 under floor
    * division. Estimate = alpha * m^2 * 2^31 / sumpow with sumpow
    * accumulating 2^(31-rho); one factor of 2 folds into the
    * denominator (71827 * 65536 * 2^30 = 5.05e18 fits a BIGINT,
    * 50000 * sumpow <= 50000 * 2^39 = 2.75e16 does too). */
  private val hllAlphaNum = 71827L

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q271_column_profile",
      """Per-column statistical profile of the events fact table — the
        |Deequ/Glue-DataBrew profiler shape: for every column, row
        |count, null count, exact distinct count, and typed min/max
        |(numerics in exact BIGINT units — micros for ts, cents for
        |value; strings lexicographic, which ASCII test data keeps
        |binary-collation-identical cross-engine). Shape: SIX
        |single-column aggregates (one per profiled column), 1-row
        |results recombined by broadcast cross-join, then unpivoted to
        |a row per column via stack. Deliberately NOT one aggregate
        |with six count(DISTINCT)s: that plans as Expand x6 — every
        |row replicated once per distinct column into one shuffle
        |carrying all columns — while a single-distinct aggregate
        |needs no Expand, and on columnar storage the six
        |column-pruned scans read each column exactly once (the same
        |total I/O as one all-column scan, 6x less shuffle, and the
        |six independent stages run concurrently). No window.
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
      // SIX single-column aggregates, not one 6-distinct aggregate: a
      // multi-distinct aggregate plans as Expand x6 (every row
      // replicated per distinct column, one 6x-row shuffle carrying
      // every column at once), while a single-distinct aggregate needs
      // no Expand at all. On columnar storage the six column-pruned
      // scans read each column exactly once — the same total I/O as one
      // scan of all six columns — and the six subtrees have no
      // dependencies, so their stages run CONCURRENTLY (at sf0.1 the
      // one-row-group scan task is serial per column; six parallel
      // serial scans beat one serial 6x-Expand pass 2.9 s -> see
      // OPTIMIZATION_r16.md). At 100 TB the win is the removed Expand:
      // shuffle bytes drop 6x to one column's distinct values per
      // subtree. The 1-row results recombine by broadcast cross-join.
      val ev = Tables.events(s, dir)
      val aId = ev.select(col("event_id")).agg(
        count(lit(1)).cast("bigint").as("n"),
        count(col("event_id")).cast("bigint").as("nn_id"),
        countDistinct(col("event_id")).cast("bigint").as("nd_id"),
        min(col("event_id")).cast("bigint").as("mn_id"),
        max(col("event_id")).cast("bigint").as("mx_id"))
      val aTs = ev.select(col("ts")).agg(
        count(col("ts")).cast("bigint").as("nn_ts"),
        countDistinct(col("ts")).cast("bigint").as("nd_ts"),
        expr("CAST(min(unix_micros(CAST(ts AS TIMESTAMP))) AS BIGINT)").as("mn_ts"),
        expr("CAST(max(unix_micros(CAST(ts AS TIMESTAMP))) AS BIGINT)").as("mx_ts"))
      val aU = ev.select(col("user_id")).agg(
        count(col("user_id")).cast("bigint").as("nn_u"),
        countDistinct(col("user_id")).cast("bigint").as("nd_u"),
        min(col("user_id")).cast("bigint").as("mn_u"),
        max(col("user_id")).cast("bigint").as("mx_u"))
      val aT = ev.select(col("event_type")).agg(
        count(col("event_type")).cast("bigint").as("nn_t"),
        countDistinct(col("event_type")).cast("bigint").as("nd_t"),
        min(col("event_type")).as("mns_t"),
        max(col("event_type")).as("mxs_t"))
      val aV = ev.select(col("value")).agg(
        count(col("value")).cast("bigint").as("nn_v"),
        countDistinct(col("value")).cast("bigint").as("nd_v"),
        min(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("mn_v"),
        max(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("mx_v"))
      val aP = ev.select(col("props")).agg(
        count(col("props")).cast("bigint").as("nn_p"),
        countDistinct(col("props")).cast("bigint").as("nd_p"),
        min(col("props")).as("mns_p"),
        max(col("props")).as("mxs_p"))
      val one = aId.crossJoin(broadcast(aTs)).crossJoin(broadcast(aU))
        .crossJoin(broadcast(aT)).crossJoin(broadcast(aV))
        .crossJoin(broadcast(aP))
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
    },

    // ----------------------------------------------------------------
    q("q289_hll_column_profile",
      """The APPROXIMATE column profile — q271's six-way distinct
        |replaced by q153's HyperLogLog register algebra (Flajolet et
        |al. 2007), which is the 100-TB profile path: q271's exact
        |multi-distinct Expand is the catalog's steepest curve (×14.8
        |at 30× data, the documented exact trade), while this query's
        |distinct-state is 6 columns × 256 registers = 1536 rows at
        |ANY corpus size — max() combines map-side, any partition
        |merge IS the HLL union, and nothing data-sized ever shuffles.
        |Per column: row count, null count, the HLL estimate, and the
        |±6.5% one-sigma band (1.04/sqrt(256), Flajolet's published
        |RSE) as integer est_lo/est_hi — the error band a profile
        |consumer gates on when approximate tolerance is acceptable
        |(else run q271). DELIBERATELY no exact column: an exact
        |distinct inside the approximate profiler would re-buy the
        |very Expand this query exists to avoid; the
        |estimate-vs-exact calibration on the fixture lives in
        |HllProfileSpec (every column's estimate within 3 sigma of
        |q271's exact counts at sf0.001/0.01/0.1) and both engines
        |recompute the identical registers here, so the estimate
        |itself is hash-gated. Determinism discipline is q153's at
        |m = 256: base-131 fold over the 24-char zero-padded key
        |(substr-then-lpad so neither engine's lpad truncation
        |semantics are in play), TWO modular squaring passes to
        |restore avalanche on sequential ids (one pass left the m=64
        |prototype 27-41% off on the id columns), alpha_256 =
        |71827/100000 under floor division, and the shared 256-entry
        |micro-nat ln table for the LinearCounting small-range
        |correction (raw <= 2.5m = 640). The rank source is a SPLICED
        |30-bit window — the first mix's low byte as the top 8 bits
        |over the second mix's mid 22 bits, rank = 31 - bitlength —
        |because a single mix's rest ranges over [0, p/256), not a
        |power of two: that skews P(rank=1) to 0.463 and read as a
        |consistent +8-21% overestimate; the spliced window is dyadic
        |exactly through rank 8 and to ~3e-4 beyond.
        |Keys are canonicalized to their first 24 chars — injective
        |on every fixture column (max props length is 9) and
        |documented as the fingerprint domain past that. Column
        |typing follows q271: ts in micros, value in cents, both as
        |decimal-exact strings.""".stripMargin,
      {
        val ln = hllLn256Micro.mkString(",")
        s"""WITH base AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(count(event_id) AS BIGINT) AS nn_id,
        |    CAST(count(ts) AS BIGINT) AS nn_ts,
        |    CAST(count(user_id) AS BIGINT) AS nn_u,
        |    CAST(count(event_type) AS BIGINT) AS nn_t,
        |    CAST(count(value) AS BIGINT) AS nn_v,
        |    CAST(count(props) AS BIGINT) AS nn_p
        |  FROM events),
        |nulls AS (
        |  SELECT 'event_id' AS column_name, n, n - nn_id AS n_null FROM base
        |  UNION ALL SELECT 'ts', n, n - nn_ts FROM base
        |  UNION ALL SELECT 'user_id', n, n - nn_u FROM base
        |  UNION ALL SELECT 'event_type', n, n - nn_t FROM base
        |  UNION ALL SELECT 'value', n, n - nn_v FROM base
        |  UNION ALL SELECT 'props', n, n - nn_p FROM base),
        |k AS (
        |  SELECT column_name, k FROM (
        |    SELECT 'event_id' AS column_name, CAST(event_id AS VARCHAR) AS k FROM events
        |    UNION ALL SELECT 'ts', CAST(epoch_us(ts) AS VARCHAR) FROM events
        |    UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        |    UNION ALL SELECT 'event_type', event_type FROM events
        |    UNION ALL SELECT 'value',
        |      CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR) FROM events
        |    UNION ALL SELECT 'props', props FROM events)
        |  WHERE k IS NOT NULL),
        |h0 AS (SELECT column_name,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, 25),
        |      i -> CAST(ascii(substr(lpad(substr(k, 1, 24), 24, '0'), i, 1)) AS BIGINT))),
        |    (a, c) -> (a * 131 + c) % 1000000007) AS h
        |  FROM k),
        |h1 AS (SELECT column_name, (h * h + h) % 1000000007 AS h1 FROM h0),
        |hm AS (SELECT column_name, h1, (h1 * h1 + h1) % 1000000007 AS h2 FROM h1),
        |r AS (SELECT column_name, h2 % 256 AS reg,
        |        (h1 % 256) * 4194304 + (h2 // 256) % 4194304 AS rest FROM hm),
        |m AS (SELECT column_name, reg,
        |        max(CASE WHEN rest = 0 THEN 31
        |                 ELSE 31 - length(bin(rest)) END) AS rho
        |      FROM r GROUP BY 1, 2),
        |f AS (SELECT c.column_name, CAST(g.reg AS BIGINT) AS reg,
        |             CAST(coalesce(m.rho, 0) AS BIGINT) AS rho
        |      FROM (SELECT DISTINCT column_name FROM nulls) c
        |      CROSS JOIN (SELECT unnest(range(0, 256)) AS reg) g
        |      LEFT JOIN m ON m.column_name = c.column_name AND m.reg = g.reg),
        |z AS (SELECT column_name,
        |        CAST(sum(1::BIGINT << CAST(31 - rho AS INT)) AS BIGINT) AS sumpow,
        |        CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS vzero
        |      FROM f GROUP BY 1),
        |e AS (SELECT column_name,
        |        CASE WHEN (CAST($hllAlphaNum AS BIGINT) * 65536 * 1073741824) // (50000 * sumpow) <= 640
        |                  AND vzero > 0
        |             THEN (256 * CAST([$ln][CAST(vzero AS INT)] AS BIGINT)) // 1000000
        |             ELSE (CAST($hllAlphaNum AS BIGINT) * 65536 * 1073741824) // (50000 * sumpow) END AS est
        |      FROM z)
        |SELECT nulls.column_name, nulls.n, nulls.n_null,
        |  CAST(e.est AS BIGINT) AS hll_estimate,
        |  CAST((e.est * 935) // 1000 AS BIGINT) AS est_lo,
        |  CAST((e.est * 1065 + 999) // 1000 AS BIGINT) AS est_hi
        |FROM nulls JOIN e USING (column_name)""".stripMargin
      }) { (s, dir) =>
      graft.plans.GraftFunctions.register(s)
      import s.implicits._
      val ev = Tables.events(s, dir)
      // ONE scan: the six typed keys stack to (column_name, k) rows
      // map-side and collapse immediately into the 1536-register state.
      // Explicit-N repartition first (the SCALE.md §4 pinning rule, the
      // q36 lesson): the per-row work is 6 hash folds, and a compact
      // parquet file arrives as ONE split — without the spread the
      // whole CPU-dense stage runs serially (measured 29 s at x10 on a
      // single-file replica vs ~3 s spread; the raw-row exchange it
      // buys is bytes-cheap)
      val keyed = ev
        .repartition(s.sparkContext.defaultParallelism)
        .select(expr(
        """stack(6,
          |  'event_id', CAST(event_id AS STRING),
          |  'ts', CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS STRING),
          |  'user_id', CAST(user_id AS STRING),
          |  'event_type', event_type,
          |  'value', CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS STRING),
          |  'props', props
          |) AS (column_name, k)""".stripMargin))
        .filter(col("k").isNotNull)
      val hm = keyed
        .select(col("column_name"), call_function("rolling_hash",
          lpad(substring(col("k"), 1, 24), 24, "0")).as("h0"))
        .select(col("column_name"), expr("(h0 * h0 + h0) % 1000000007").as("h1"))
        .select(col("column_name"), col("h1"),
          expr("(h1 * h1 + h1) % 1000000007").as("h2"))
      val m = hm
        .select(col("column_name"), (col("h2") % 256).as("reg"),
          expr("(h1 % 256) * 4194304 + (h2 DIV 256) % 4194304").as("rest"))
        .groupBy(col("column_name"), col("reg"))
        .agg(max(expr(
          "CASE WHEN rest = 0 THEN 31L ELSE CAST(31 - length(bin(rest)) AS BIGINT) END")).as("rho"))
      // densified registers come from a LITERAL column list x range(256)
      // (never from the data), so an empty corpus still yields 6 rows
      // with estimate 0 — the EmptyInputSpec contract
      val colNames = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      val f = colNames.toDF("column_name")
        .crossJoin(s.range(256).select(col("id").as("reg")))
        .join(m, Seq("column_name", "reg"), "left")
        .select(col("column_name"), coalesce(col("rho"), lit(0L)).as("rho"))
      val est = f.groupBy(col("column_name")).agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - rho AS INT))"))
          .cast("long").as("sumpow"),
        sum(when(col("rho") === 0, 1L).otherwise(0L)).cast("long").as("vzero"))
        .select(col("column_name"), expr(
          s"""CASE WHEN (CAST($hllAlphaNum AS BIGINT) * 65536 * 1073741824) DIV (50000 * sumpow) <= 640
             |          AND vzero > 0
             |     THEN (256 * CAST(element_at(array(${hllLn256Micro.mkString(",")}),
             |                     CAST(vzero AS INT)) AS BIGINT)) DIV 1000000
             |     ELSE (CAST($hllAlphaNum AS BIGINT) * 65536 * 1073741824) DIV (50000 * sumpow)
             |END""".stripMargin).as("hll_estimate"))
      val nulls = ev.agg(
        count(lit(1)).cast("bigint").as("n"),
        count(col("event_id")).cast("bigint").as("nn_id"),
        count(col("ts")).cast("bigint").as("nn_ts"),
        count(col("user_id")).cast("bigint").as("nn_u"),
        count(col("event_type")).cast("bigint").as("nn_t"),
        count(col("value")).cast("bigint").as("nn_v"),
        count(col("props")).cast("bigint").as("nn_p"))
        .select(col("n"), expr(
          """stack(6,
            |  'event_id', n - nn_id, 'ts', n - nn_ts, 'user_id', n - nn_u,
            |  'event_type', n - nn_t, 'value', n - nn_v, 'props', n - nn_p
            |) AS (column_name, n_null)""".stripMargin))
      nulls.join(broadcast(est), Seq("column_name"))
        .select(col("column_name"), col("n"), col("n_null"), col("hll_estimate"),
          expr("(hll_estimate * 935) DIV 1000").as("est_lo"),
          expr("(hll_estimate * 1065 + 999) DIV 1000").as("est_hi"))
    },

    // ----------------------------------------------------------------
    q("q290_artifact_staleness",
      """TRAINED-ARTIFACT staleness report, oracle-gated: the r16
        |ArtifactMonitor tier as a registered query, on the kernel whose
        |statistic is fully SQL-expressible — StreamCusum's per-type μ.
        |The event horizon splits at its midpoint hour: μ trains on the
        |FIRST half (the exact q227/cusumMu spine-mean formula the
        |serving kernel freezes) and the SECOND half plays the sliding
        |window; the report is ArtifactMonitor.cusumMuReport VERBATIM —
        |per type, the frozen μ, the window's recomputed μ, their
        |absolute deviation in permille of the reference, and the
        |retrain flag at the 250‰ default (CUSUM's own slack is μ/4, so
        |a shift the chart would alarm on within hours is a shift worth
        |retraining for). This pins the monitor's arithmetic cross-
        |engine; the other four monitors' fire/silent behavior is
        |spec-proven (ArtifactMonitorSpec) because their statistics
        |(codebook inertia, HLL-free KS, span dictionaries) are shared
        |JVM kernels, not SQL.
        |Scale shape: two (type, hour) histogram aggregates with
        |map-side combine (each bounded by types × wall-clock hours),
        |two model-sized collects (the 1-row split bound and the
        ||types|-row trained μ — the q246/q283 train-offline
        |discipline), one |types|-row join. Nothing row-bounded ever
        |shuffles twice.""".stripMargin,
      """WITH hrs AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events),
        |b AS (SELECT (min(h) + max(h) + 1) // 2 AS split FROM hrs),
        |trc AS (SELECT event_type, h, count(*)::BIGINT AS cnt
        |        FROM hrs, b WHERE h < split GROUP BY 1, 2),
        |trs AS (SELECT event_type,
        |          CAST((1000 * CAST(sum(cnt) AS BIGINT))
        |               // (max(h) - min(h) + 1) AS BIGINT) AS ref_mu_milli
        |        FROM trc GROUP BY 1),
        |wnc AS (SELECT event_type, h, count(*)::BIGINT AS cnt
        |        FROM hrs, b WHERE h >= split GROUP BY 1, 2),
        |wns AS (SELECT event_type,
        |          CAST((1000 * CAST(sum(cnt) AS BIGINT))
        |               // (max(h) - min(h) + 1) AS BIGINT) AS window_mu_milli
        |        FROM wnc GROUP BY 1)
        |SELECT *, dev_pm > 250 AS retrain FROM (
        |  SELECT w.event_type, t.ref_mu_milli, w.window_mu_milli,
        |    CAST((1000 * abs(w.window_mu_milli - t.ref_mu_milli))
        |         // greatest(t.ref_mu_milli, 1) AS BIGINT) AS dev_pm
        |  FROM wns w JOIN trs t ON t.event_type = w.event_type)""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val hourExpr = "unix_micros(ts) DIV 3600000000"
      // 1-row bound collect (model-sized): the horizon midpoint. Null
      // on an empty corpus — both halves are then empty and the report
      // is structurally empty, matching the oracle's NULL-comparison
      // empties.
      val b = ev.agg(min(expr(hourExpr)).as("h0"), max(expr(hourExpr)).as("h1"))
        .head
      val split = if (b.isNullAt(0)) 0L else (b.getLong(0) + b.getLong(1) + 1L) / 2L
      val train = ev.filter(expr(s"$hourExpr < $split"))
      val window = ev.filter(expr(s"$hourExpr >= $split"))
      // the trained artifact, exactly as StreamCusum consumes it:
      // |types|-row collect of the spine-mean μ (train-offline shape)
      val mu = EventsOps.cusumMu(train).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      graft.streaming.ArtifactMonitor.cusumMuReport(window, mu)
    })
}
