package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Fns._
import org.apache.spark.sql.functions._

/** Third ring of the SQL surface: pivot, explode (lateral/UDTF shape),
  * GROUPING SETS, correlated scalar subqueries, EXISTS/NOT EXISTS,
  * interval joins (equi+range and pure-range), and the datetime/string
  * scalar-function surface. Together with Relational/AdvancedOps this
  * closes out what a user of the reference's Athena tier
  * (diagram.svg:3 "Analytical queries (Athena, Spark)") could type.
  */
object ExtendedOps {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q45_pivot",
      """Pivot: per-user event counts spread across one column per event
        |type. Values list is pinned (no extra distinct pass), so the plan
        |is a single hash aggregate with conditional counts — map-side
        |partial agg applies, one shuffle on user_id.""".stripMargin,
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val p = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
      // pivot emits NULL for absent (user, type) combos; the oracle's
      // FILTER counts emit 0 — normalize.
      p.select(col("user_id") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    },

    // ----------------------------------------------------------------
    q("q46_explode_words",
      """Explode / lateral (the UDTF shape): document text split to words,
        |one output row per element, then a word-frequency aggregate.
        |Generate runs inside whole-stage codegen; the only shuffle is the
        |final count groupBy.""".stripMargin,
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
    },

    // ----------------------------------------------------------------
    q("q47_grouping_sets",
      """GROUPING SETS with grouping() markers: two independent
        |one-dimension rollups plus the grand total in a single
        |Expand+HashAggregate pass — cheaper than unioning three
        |aggregates (one scan, one shuffle).""".stripMargin,
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("revenue"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"))
    },

    // ----------------------------------------------------------------
    q("q48_corr_subquery",
      """Correlated scalar subquery, decorrelated: customers with an
        |account balance above their nation's average. The oracle keeps
        |the correlated form; the engine runs what a decorrelator
        |produces — one per-nation aggregate (tiny) broadcast back onto
        |customer. Comparison is exact: balance*count > sum in decimals on
        |both sides, so no float-mean boundary flips.""".stripMargin,
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin) { (s, dir) =>
      val perNation = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(dec(col("c_acctbal"))).as("total"), count(lit(1)).as("n"))
      Tables.customer(s, dir)
        .join(broadcast(perNation), col("c_nationkey") === col("nk"))
        .filter(dec(col("c_acctbal")) * col("n") > col("total"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },

    // ----------------------------------------------------------------
    q("q49_exists_not_exists",
      """EXISTS + NOT EXISTS in one query: customers with at least one
        |completed ('F') order and no open ('O') order. Planned as a
        |left-semi then left-anti join — both on o_custkey, so at scale
        |they share one partitioning of orders.""".stripMargin,
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val fCust = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val oCust = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(fCust, col("c_custkey") === fCust("o_custkey"), "left_semi")
        .join(oCust, col("c_custkey") === oCust("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ----------------------------------------------------------------
    q("q50_interval_attribution",
      """Equi+range interval join (attribution): for each purchase, count
        |the same user's clicks in the preceding hour. The equi key
        |(user_id) keeps the join hash/sort-merge partitionable at scale;
        |the time predicate is a post-join filter over a bounded window,
        |so per-user fan-out is capped by the hour of history. Hot users
        |are AQE skew-join territory, not a replan.""".stripMargin,
      """SELECT p.event_id, p.user_id, count(c.cid) AS n_clicks
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT event_id AS cid, user_id AS cu, ts AS cts
        |           FROM events WHERE event_type = 'click') c
        |  ON c.cu = p.user_id AND c.cts <= p.ts
        | AND c.cts > p.ts - INTERVAL 1 HOUR
        |GROUP BY p.event_id, p.user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cu"), col("ts").as("cts"))
      purchases
        .join(clicks,
          col("cu") === col("user_id") &&
            col("cts") <= col("ts") &&
            col("cts") > col("ts") - expr("INTERVAL 1 HOUR"),
          "left")
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(col("cid")).as("n_clicks"))
    },

    // ----------------------------------------------------------------
    q("q51_broadcast_range_join",
      """Pure range join (no equi key): global error events counted inside
        |each top-50 user's activity span. Scale pattern: the range side
        |is reduced to a provably-small set first (top-k spans), inner
        |broadcast-joined against the big side, and zero-match spans are
        |recovered with a small-side left join — the big table is never
        |nested-loop'd against anything non-broadcast.""".stripMargin,
      """WITH spans AS (
        |  SELECT user_id, lo_us, hi_us, n FROM (
        |    SELECT user_id, min(epoch_us(ts)) AS lo_us, max(epoch_us(ts)) AS hi_us,
        |           count(*) AS n,
        |           row_number() OVER (ORDER BY count(*) DESC, user_id) AS rk
        |    FROM events GROUP BY user_id)
        |  WHERE rk <= 50),
        |errs AS (SELECT epoch_us(ts) AS e_us FROM events WHERE event_type = 'error')
        |SELECT s.user_id, s.n AS n_user_events, count(e.e_us) AS n_errors_in_span
        |FROM spans s LEFT JOIN errs e ON e.e_us >= s.lo_us AND e.e_us <= s.hi_us
        |GROUP BY s.user_id, s.n""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      // materialized once: spans feeds both the broadcast range join and
      // the final zero-recovery join — without the checkpoint the
      // events aggregate + global top-k sort would execute twice
      val spans = ev.groupBy(col("user_id"))
        .agg(min(epochUs(col("ts"))).as("lo_us"), max(epochUs(col("ts"))).as("hi_us"),
          count(lit(1)).as("n_user_events"))
        .orderBy(col("n_user_events").desc, col("user_id"))
        .limit(50)
        .transform(graft.Graft.stagedCheckpoint)
      val errs = ev.filter(col("event_type") === "error")
        .select(epochUs(col("ts")).as("e_us"))
      val hits = errs
        .join(broadcast(spans.select(col("user_id").as("su"), col("lo_us"), col("hi_us"))),
          col("e_us") >= col("lo_us") && col("e_us") <= col("hi_us"))
        .groupBy(col("su"))
        .agg(count(lit(1)).as("hit_n"))
      spans.join(hits, col("user_id") === col("su"), "left")
        .select(col("user_id"), col("n_user_events"),
          coalesce(col("hit_n"), lit(0L)).as("n_errors_in_span"))
    },

    // ----------------------------------------------------------------
    q("q72_full_outer",
      """Full outer join: daily high-value purchase counts reconciled
        |against daily high-value error counts — days that appear on only
        |one side survive with an explicit zero on the other (both
        |one-sided cases occur in the test data). Both inputs are already
        |aggregated to one row per day, so the outer join's shuffle
        |carries day-grain rows, not events.""".stripMargin,
      """WITH a AS (SELECT date_trunc('day', ts) AS d, count(*) AS n
        |  FROM events WHERE event_type = 'purchase' AND value > 300 GROUP BY 1),
        |b AS (SELECT date_trunc('day', ts) AS d, count(*) AS m
        |  FROM events WHERE event_type = 'error' AND value > 300 GROUP BY 1)
        |SELECT coalesce(a.d, b.d) AS day,
        |  coalesce(n, 0) AS hi_purchases, coalesce(m, 0) AS hi_errors
        |FROM a FULL OUTER JOIN b ON a.d = b.d""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      def daily(tpe: String, out: String) = ev
        .filter(col("event_type") === tpe && col("value") > 300)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as(out))
      val a = daily("purchase", "n")
      val b = daily("error", "m").withColumnRenamed("d", "d2")
      a.join(b, col("d") === col("d2"), "full_outer")
        // .cast("date"): DuckDB's date_trunc('day') yields DATE while
        // Spark's yields TIMESTAMP — repr-identical through pandas
        // (midnight), but OracleSchemaSpec pins real type agreement
        .select(coalesce(col("d"), col("d2")).cast("date").as("day"),
          coalesce(col("n"), lit(0L)).as("hi_purchases"),
          coalesce(col("m"), lit(0L)).as("hi_errors"))
    },

    // ----------------------------------------------------------------
    q("q52_calendar_profile",
      """Datetime extraction surface: day-of-week × hour activity
        |profile. Both extracts are codegen'd scalar ops on the scan; the
        |aggregate output is at most 7×24 groups, so the final shuffle is
        |trivially small no matter the input scale.""".stripMargin,
      """SELECT (dayofweek(ts) + 1) AS dow, hour(ts) AS hr,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
    },

    // ----------------------------------------------------------------
    q("q73_session_window",
      """Native session windows in BATCH mode: per-user sessions closed
        |after 30 minutes of inactivity via session_window — Spark's
        |merging session state, not a manual lag+cumsum composition. The
        |oracle replays the exact merge semantics (break when the gap
        |reaches the threshold, session end = last event + gap) with the
        |two-window formulation, pinning the two constructions
        |equal.""".stripMargin,
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |         OR lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, min(epoch_us(ts)) AS start_us,
        |  max(epoch_us(ts)) + 1800000000 AS end_us, count(*) AS n
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), epochUs(col("w.start")).as("start_us"),
          epochUs(col("w.end")).as("end_us"), col("n"))
    },

    // ----------------------------------------------------------------
    q("q53_string_funcs",
      """String scalar-function surface in one projection: case mapping,
        |length, substring, replace, split_part, concat_ws, lpad. Pure
        |per-row codegen — no shuffle, columns pruned to the five used
        |part columns at the scan.""".stripMargin,
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  length(p_name) AS len,
        |  substring(p_name, 1, 8) AS prefix8,
        |  replace(p_name, ' ', '_') AS snake,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4
        |FROM part""".stripMargin) { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"))
    },

    // ----------------------------------------------------------------
    q("q175_dq_audit",
      """Data-quality AUDIT report — the expectations suite a pipeline
        |runs before trusting a new data drop (and the operator the
        |reference's crawler-driven "detect drift, don't break"
        |posture implies): one tall (check, violations, checked) row
        |per assertion, spanning referential integrity (orphaned
        |lineitems, childless orders, orphaned custkeys — broadcast
        |anti/semi joins), key uniqueness (count vs count-distinct, no
        |self-join), domain rules (non-positive monetary values,
        |regex-malformed JSON props), and physical consistency
        |(declared n_chars vs actual length; ragged embedding
        |dimensions vs the corpus-wide max).  A healthy drop yields
        |all-zero violations WITH the checked denominators proving the
        |checks ran — childless orders are legitimately nonzero here,
        |pinning that violations actually count.  Scale shape: every
        |check is one scan-side aggregate or one key-partitioned
        |anti/semi join; the report union is |checks| rows.""".stripMargin,
      """SELECT 'lineitem_orphan_orderkey' AS check_name,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT AS n_violations,
        |  (SELECT count(*) FROM lineitem)::BIGINT AS n_checked
        |UNION ALL SELECT 'orders_childless',
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))::BIGINT,
        |  (SELECT count(*) FROM orders)::BIGINT
        |UNION ALL SELECT 'orders_orphan_custkey',
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT,
        |  (SELECT count(*) FROM orders)::BIGINT
        |UNION ALL SELECT 'orders_pk_duplicate',
        |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)::BIGINT,
        |  (SELECT count(*) FROM orders)::BIGINT
        |UNION ALL SELECT 'events_value_nonpositive',
        |  (SELECT count(*) FROM events
        |   WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) <= 0)::BIGINT,
        |  (SELECT count(*) FROM events)::BIGINT
        |UNION ALL SELECT 'events_props_malformed',
        |  (SELECT count(*) FROM events
        |   WHERE NOT regexp_matches(props, '^\{"k": [0-9]+\}$'))::BIGINT,
        |  (SELECT count(*) FROM events)::BIGINT
        |UNION ALL SELECT 'documents_nchars_mismatch',
        |  (SELECT count(*) FROM documents WHERE n_chars <> length(text))::BIGINT,
        |  (SELECT count(*) FROM documents)::BIGINT
        |UNION ALL SELECT 'embeddings_ragged_dim',
        |  (SELECT count(*) FROM embeddings
        |   WHERE len(embedding) <> (SELECT max(len(embedding)) FROM embeddings))::BIGINT,
        |  (SELECT count(*) FROM embeddings)::BIGINT""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir); val o = Tables.orders(s, dir)
      val cu = Tables.customer(s, dir); val ev = Tables.events(s, dir)
      val doc = Tables.documents(s, dir); val em = Tables.embeddings(s, dir)
      // fully declarative: each check is ONE single-row aggregate plan
      // (orphan checks via left join + null-marker conditional count, so
      // violations and the checked denominator ride the same pass); the
      // report is the union of eight one-row plans — no driver collects
      def check(name: String, d: org.apache.spark.sql.DataFrame,
          violation: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
        d.agg(sum(when(violation, 1L).otherwise(0L)).cast("long").as("n_violations"),
            count(lit(1)).as("n_checked"))
          .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
      val liJoined = li.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey").as("l_orderkey"), lit(1).as("hit_o")),
          Seq("l_orderkey"), "left")
      val oChild = o.select(col("o_orderkey"))
        .join(li.select(col("l_orderkey").as("o_orderkey")).distinct()
          .withColumn("hit_l", lit(1)), Seq("o_orderkey"), "left")
      val oCust = o.select(col("o_custkey"))
        .join(broadcast(cu.select(col("c_custkey").as("o_custkey"), lit(1).as("hit_c"))),
          Seq("o_custkey"), "left")
      val pkDup = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("k"))
        .agg(sum(col("k") - 1).cast("long").as("n_violations"),
          sum(col("k")).cast("long").as("n_checked"))
        .select(lit("orders_pk_duplicate").as("check_name"),
          col("n_violations"), col("n_checked"))
      val ragged = em.crossJoin(broadcast(
        em.agg(max(size(col("embedding"))).as("maxd"))))
      Seq(
        check("lineitem_orphan_orderkey", liJoined, col("hit_o").isNull),
        check("orders_childless", oChild, col("hit_l").isNull),
        check("orders_orphan_custkey", oCust, col("hit_c").isNull),
        pkDup,
        check("events_value_nonpositive", ev,
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) <= 0")),
        check("events_props_malformed", ev,
          !col("props").rlike("^\\{\"k\": [0-9]+\\}$")),
        check("documents_nchars_mismatch", doc,
          col("n_chars") =!= length(col("text"))),
        check("embeddings_ragged_dim", ragged,
          size(col("embedding")) =!= col("maxd")))
        .reduce(_ unionAll _)
    })
}
