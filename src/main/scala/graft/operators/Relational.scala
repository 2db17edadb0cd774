package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator suite: scans, filter/projection, joins (broadcast,
  * multi-way, semi, anti), aggregation, rollup, window ranking, sort/limit,
  * set ops — the batch-analytics tier of the reference ("Analytical
  * queries (Athena, Spark)", reference diagram.svg:3), re-expressed over
  * the driver's TPC-H-ish tables.
  *
  * Scale notes are per-query; the common rules:
  *   - dims (region/nation/customer/supplier/part) are broadcast — no
  *     shuffle on the fact side for enrichment joins (SURVEY.md §2.4 J1);
  *   - aggregations rely on partial (map-side) aggregation, so a hot key
  *     costs only one reducer's final merge;
  *   - filters/projections stay declarative → parquet pushdown + pruning.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q1_pricing_summary",
      """TPC-H Q1-shaped pricing summary: full lineitem scan, partial+final
        |hash aggregation on a low-cardinality key. At 100 TB this is
        |scan-bound; the decimal sums keep map-side combine exact.
        |(SURVEY.md A6: review-score-style aggregates.)""".stripMargin,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS DOUBLE) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ----------------------------------------------------------------
    q("q2_scan_filter_agg",
      """TPC-H Q6-shaped selective scan: every predicate is sargable and
        |must appear in the parquet scan's PushedFilters; the projection
        |prunes to 4 columns. Single global aggregate — partial agg makes
        |the final reduce a 32-row merge.""".stripMargin,
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .filter(col("l_discount").between(0.03, 0.07))
        .filter(col("l_quantity") < 24)
        .agg(
          sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ----------------------------------------------------------------
    q("q3_project_cast",
      """Projection + cast + string scalar functions (SURVEY.md F7/F8):
        |row-level output, no shuffle at all — the whole query is one
        |WholeStageCodegen over the scan.""".stripMargin,
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) AS qty_int,
        |  upper(l_returnflag) AS flag_uc,
        |  concat(l_returnflag, '/', l_linestatus) AS flag_status
        |FROM lineitem
        |WHERE l_quantity >= 49""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 49)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("bigint").as("qty_int"),
          upper(col("l_returnflag")).as("flag_uc"),
          concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag_status"))
    },

    // ----------------------------------------------------------------
    q("q4_broadcast_join_agg",
      """Stream-static-style enrichment join (SURVEY.md J1): fact join
        |small dim. customer is broadcast — verified in the plan as
        |BroadcastHashJoin — so the orders side never shuffles for the
        |join; only the 5-group aggregate shuffles (32 partial rows per
        |task). The same shape as views⋈items in the reference
        |(diagram.svg:3 Static-data edge).""".stripMargin,
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    },

    // ----------------------------------------------------------------
    q("q5_multiway_join",
      """Catalog-to-catalog multi-way join (SURVEY.md J4): fact ⋈ three
        |nested dims. The dim chain (customer⋈nation⋈region) is resolved
        |as cascaded broadcasts; at 100 TB the orders fact is the only
        |large input and it streams through without a single shuffle
        |before the final small aggregate.""".stripMargin,
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      val dims = Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      Tables.orders(s, dir)
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    },

    // ----------------------------------------------------------------
    q("q6_anti_join",
      """Anti join — the IP-filter shape (SURVEY.md F1/J2: drop events
        |whose key is in a deny set). Here: customers with no order since
        |2001-01-01. The deny side is aggregated/broadcast; at scale this
        |is a broadcast anti join, never a shuffle of the big side.""".stripMargin,
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin) { (s, dir) =>
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2001-01-01 00:00:00").cast("timestamp"))
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(broadcast(recent), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ----------------------------------------------------------------
    q("q7_semi_join",
      """Semi join: customers having at least one high-value order.
        |Broadcast left-semi — probe side streams, no duplication of
        |matches (vs inner join + distinct, which would shuffle).""".stripMargin,
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(broadcast(big), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    },

    // ----------------------------------------------------------------
    q("q8_topk_per_group",
      """Windowed top-K ranking (SURVEY.md A2/A3/W2/W4: most-popular
        |items/categories). rank() over (partition by brand order by
        |exact-decimal qty desc, partkey) then rank<=2. One shuffle on the
        |partition key; ties broken deterministically by key so the result
        |set is stable across engines and cluster sizes.""".stripMargin,
      """WITH per_part AS (
        |  SELECT p_brand, l_partkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, l_partkey)
        |SELECT p_brand, l_partkey, CAST(qty AS DOUBLE) AS total_qty, rk
        |FROM (
        |  SELECT p_brand, l_partkey, qty,
        |    rank() OVER (PARTITION BY p_brand ORDER BY qty DESC, l_partkey) AS rk
        |  FROM per_part)
        |WHERE rk <= 2""".stripMargin) { (s, dir) =>
      val perPart = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("qty").desc, col("l_partkey"))
      perPart
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 2)
        .select(col("p_brand"), col("l_partkey"),
          col("qty").cast("double").as("total_qty"), col("rk"))
    },

    // ----------------------------------------------------------------
    q("q9_rollup",
      """ROLLUP hierarchy aggregate (region → nation → grand total).
        |Catalyst expands to a single Expand+HashAggregate — one pass,
        |one shuffle, same semantics as the Athena tier's GROUP BY
        |ROLLUP.""".stripMargin,
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin) { (s, dir) =>
      val dims = Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      Tables.orders(s, dir)
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
    },

    // ----------------------------------------------------------------
    q("q10_sort_limit",
      """Global top-N (SURVEY.md W1/W4): orderBy+limit compiles to
        |TakeOrderedAndProject — each task keeps N rows, driver merges;
        |no global sort materialization even at 100 TB. Raw double
        |pass-through (no arithmetic) is bit-stable; ties broken by
        |key.""".stripMargin,
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // ----------------------------------------------------------------
    q("q11_set_ops",
      """Set operations: nations that have customers but no suppliers
        |(EXCEPT = distinct anti semantics). The fact sides reduce to
        |distinct int keys FIRST (map-side partial distinct collapses
        |each to <=|nations| rows before any shuffle), then broadcast as
        |semi-filters onto the tiny nation dim — the except never sees a
        |fact-sized input. The naive shape (join then except over names)
        |shuffles every fact row's string.""".stripMargin,
      """SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
        |EXCEPT
        |SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
      val n = Tables.nation(s, dir)
      val custKeys = Tables.customer(s, dir).select(col("c_nationkey")).distinct()
      val suppKeys = Tables.supplier(s, dir).select(col("s_nationkey")).distinct()
      val withCust = n.join(broadcast(custKeys),
        col("n_nationkey") === col("c_nationkey"), "left_semi").select(col("n_name"))
      val withSupp = n.join(broadcast(suppKeys),
        col("n_nationkey") === col("s_nationkey"), "left_semi").select(col("n_name"))
      withCust.except(withSupp)
    },

    // ----------------------------------------------------------------
    q("q35_sql_catalog",
      """The Athena/catalog tier (SURVEY.md S6/J4, reference
        |run_flow.py:147-160 create_athena_table): register every table
        |as a catalog view and run the query through spark.sql — same
        |Catalyst plan as the DataFrame path, proving the SQL surface.""".stripMargin,
      """SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name, count(DISTINCT c_custkey) AS n_customers,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin)
    },

    // ----------------------------------------------------------------
    q("q12_distinct_stats",
      """Count-distinct tier (SURVEY.md A5: distinct IPs/devices per
        |window). Exact countDistinct for oracle parity; the scale path is
        |approx_count_distinct (HLL, exposed as q13).""".stripMargin,
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
    })
}
