package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Fns._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytical queries over the driver's TPC-H-ish
  * tables — the canonical multi-join star-schema workloads an analytics
  * engine must own (the reference's Athena tier runs exactly this class
  * of query over its catalog, diagram.svg:3 "Analytical queries").
  * Shapes follow the public TPC-H spec queries, adapted to the columns
  * the test schema actually has; money math is exact-decimal.
  */
object TpchOps {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q59_shipping_priority",
      """TPC-H Q3 shape (shipping priority): top-10 unshipped orders by
        |revenue at a cutoff date. Two hash joins on the fact's own keys,
        |decimal-exact revenue, TakeOrdered top-k with a key tie-break —
        |no global sort of the join output at any scale.""".stripMargin,
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      val cutoff = lit("1997-01-01 00:00:00").cast("timestamp")
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // ----------------------------------------------------------------
    q("q60_local_supplier_volume",
      """TPC-H Q5 shape (local supplier volume): revenue per nation where
        |customer and supplier share the nation, one region, one year.
        |The region/nation dims broadcast; lineitem joins orders and
        |supplier on its own keys; the c_nationkey = s_nationkey
        |condition rides the customer join — the only shuffles are the
        |two fact-fact joins.""".stripMargin,
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
    },

    // ----------------------------------------------------------------
    q("q61_returned_items",
      """TPC-H Q10 shape (returned-item reporting): top-20 customers by
        |revenue lost to returns. Fact-fact join then broadcast customer
        |attributes onto the (small) aggregated result, not the raw
        |fact — at scale the join order is what keeps the wide customer
        |row out of the shuffle.""".stripMargin,
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val perCust = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      perCust
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ----------------------------------------------------------------
    q("q69_promo_revenue",
      """TPC-H Q14 shape (promotion effect): share of one month's revenue
        |from PROMO parts. Conditional aggregation over one broadcast
        |join — both sums ride a single pass; the final ratio is one
        |double division of two exact decimals, so it is bit-stable.""".stripMargin,
      """SELECT
        |  CAST(CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |     / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS DOUBLE) AS promo_share,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { (s, dir) =>
      val disc = discPrice(col("l_extendedprice"), col("l_discount"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type").like("PROMO%"), disc)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(disc).cast("double")).cast("double").as("promo_share"),
          count(lit(1)).as("n_lines"))
    },

    // ----------------------------------------------------------------
    q("q70_bracket_predicates",
      """TPC-H Q19 shape (discounted revenue under OR'd brackets): three
        |brand/size/quantity bracket disjuncts. The predicate splits
        |across the join — part-only conjuncts (brand, size) push into
        |the part scan, lineitem bounds (quantity envelope) into the fact
        |scan — and the residual OR evaluates post-join in codegen.""".stripMargin,
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, dir) =>
      val bracket =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(bracket)
        .agg(count(lit(1)).as("n_lines"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"))
    },

    // ----------------------------------------------------------------
    q("q67_market_basket",
      """Co-occurrence (frequent-itemset shape): part pairs appearing in
        |>= 2 common orders. Instead of a self-join (which shuffles the
        |distinct line set twice), parts are collected per order into a
        |sorted array — one shuffle on the order key — and ordered pairs
        |are expanded inside codegen with array HOFs; fan-out is bounded
        |by per-order line count squared, the same bounded-bucket
        |argument as LSH bands. The only other shuffle carries the pair
        |counts — at explicit conf width (REPARTITION_BY_NUM, exempt
        |from AQE coalescing): the pair reduce is CPU-dense and
        |byte-cheap, so AQE's byte-proportional coalescing collapsed it
        |to 1-3 tasks (measured r16: the whole 5M-pair aggregate ran
        |serially, 1.73 s vs 1.00 s at full width isolated; at sf10
        |under a 16 GiB heap the same serial hash table spilled 62 GB).
        |Same pinning rule as q130's intersect exchanges.""".stripMargin,
      """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |  count(*) AS n_orders
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |            y -> struct(x AS part_a, y AS part_b))))""".stripMargin))
          .as("p"))
        .select(col("p.part_a"), col("p.part_b"))
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("part_a"), col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
    },

    // ----------------------------------------------------------------
    q("q71_moment_stats",
      """Statistical aggregates (stddev, correlation) computed from exact
        |decimal moments: Σx, Σx², Σy, Σy², Σxy accumulate as decimals
        |(order-independent, partial-agg friendly), then one identical
        |double formula on both engines. Native stddev/corr use
        |incremental float updates whose low bits depend on visit order —
        |unusable for cross-engine (or even re-run) reproducibility at
        |scale; moments are the distributed-safe formulation.""".stripMargin,
      """WITH m AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx2,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
        |           * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy2,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  sqrt((CAST(n AS DOUBLE) * sx2 - sx * sx)
        |     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS stddev_price,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sx2 - sx * sx)
        |     * sqrt(CAST(n AS DOUBLE) * sy2 - sy * sy)) AS corr_price_qty
        |FROM m""".stripMargin) { (s, dir) =>
      val x = dec(col("l_extendedprice"))
      val y = dec(col("l_quantity"))
      // decimal -> STRING -> double, not a direct decimal->double cast:
      // the decimal digits are exact and string->double parsing is
      // correctly rounded in both engines, whereas DuckDB's direct
      // decimal->double conversion can land one ulp off the correctly
      // rounded value (observed at sf0.001), which the variance formula
      // then amplifies past hash tolerance.
      def d(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
      val m = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          d(sum(x)).as("sx"),
          d(sum(x * x)).as("sx2"),
          d(sum(y)).as("sy"),
          d(sum(y * y)).as("sy2"),
          d(sum(x * y)).as("sxy"))
      val nD = col("n").cast("double")
      m.select(col("l_returnflag"), col("n"),
        sqrt((nD * col("sx2") - col("sx") * col("sx")) / (nD * (nD - 1)))
          .as("stddev_price"),
        ((nD * col("sxy") - col("sx") * col("sy")) /
          (sqrt(nD * col("sx2") - col("sx") * col("sx")) *
            sqrt(nD * col("sy2") - col("sy") * col("sy"))))
          .as("corr_price_qty"))
    },

    // ----------------------------------------------------------------
    q("q62_window_distribution",
      """Distribution window functions over per-(type,user) activity:
        |quartile (ntile), percent_rank, cume_dist, lead, and
        |greatest/least clamps. All frames share one (event_type)
        |partitioning and (n, user_id) sort — Catalyst plans a single
        |shuffle+sort for the lot. percent_rank/cume_dist are integer
        |ratios, so bit-stable across engines.""".stripMargin,
      """SELECT event_type, user_id, n,
        |  ntile(4) OVER w AS quartile,
        |  CAST(percent_rank() OVER w AS DOUBLE) AS pr,
        |  CAST(cume_dist() OVER w AS DOUBLE) AS cd,
        |  lead(user_id) OVER w AS next_user,
        |  greatest(n, CAST(25 AS BIGINT)) AS n_floor25,
        |  least(n, CAST(25 AS BIGINT)) AS n_cap25
        |FROM (SELECT event_type, user_id, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |WINDOW w AS (PARTITION BY event_type ORDER BY n, user_id)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("n"), col("user_id"))
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("user_id"), col("n"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).cast("double").as("pr"),
          cume_dist().over(w).cast("double").as("cd"),
          lead(col("user_id"), 1).over(w).as("next_user"),
          greatest(col("n"), lit(25L)).as("n_floor25"),
          least(col("n"), lit(25L)).as("n_cap25"))
    },

    // ----------------------------------------------------------------
    q("q101_large_orders",
      """TPC-H Q18 shape (large-volume customers): orders whose total
        |line quantity exceeds a threshold, with their customer, top-100
        |by order value. The HAVING prefilter aggregates the fact table
        |ONCE (map-side-combined sum per order key) and only qualifying
        |order keys enter the joins — the join input is pre-shrunk to
        |the selective set rather than joining the whole fact and
        |filtering after. Customer dim broadcasts; top-100 is a
        |TakeOrdered with an order-key tie-break. Quantity sums are
        |exact decimals, string-bridged to double (direct decimal->
        |double casts can differ by 1 ulp between engines).""".stripMargin,
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS qty_sum
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 140)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, qty_sum
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty_dec"))
        .filter(col("qty_dec") > 140)
        .select(col("l_orderkey"),
          col("qty_dec").cast("string").cast("double").as("qty_sum"))
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("qty_sum"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    },

    // ----------------------------------------------------------------
    q("q102_dormant_balances",
      """TPC-H Q22 shape (global sales opportunity), adapted to the test
        |schema: positive-balance customers ABOVE the average positive
        |balance with NO recent orders, grouped by nation. The
        |above-average test runs as integer cross-multiplication
        |(cents x n_pos > total_cents) so the threshold — normally a
        |float AVG whose low bits depend on summation order — is exact
        |and engine-independent. The recent-order check is a broadcast
        |anti join against the DISTINCT recent customer keys (the fact
        |table reduces before the join, not after), and balances travel
        |as exact integer cents end to end.""".stripMargin,
      """WITH pos AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM customer WHERE c_acctbal > 0),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents,
        |             count(*) AS n_pos FROM pos),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01'),
        |d AS (
        |  SELECT p.* FROM pos p, t
        |  WHERE p.cents * t.n_pos > t.total_cents
        |    AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = p.c_custkey))
        |SELECT c_nationkey, count(*) AS n_custs,
        |  CAST(sum(cents) AS BIGINT) AS total_dormant_cents
        |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
      val pos = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_nationkey"),
          (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val tot = pos.agg(sum(col("cents")).cast("long").as("total_cents"),
        count(lit(1)).as("n_pos"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      pos.crossJoin(broadcast(tot))
        .filter(col("cents") * col("n_pos") > col("total_cents"))
        .join(broadcast(recent), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_custs"),
          sum(col("cents")).cast("long").as("total_dormant_cents"))
    },

    // ----------------------------------------------------------------
    q("q106_order_priority_waits",
      """TPC-H Q4 shape (order-priority checking), adapted to the test
        |schema's shipdate-only lineitem: orders placed in 1996 where at
        |least one line shipped 90+ days after the order date, counted by
        |priority. The EXISTS runs as a LEFT SEMI hash join keyed on the
        |order key with the 90-day lag as a residual join condition — the
        |fact table is never aggregated or deduplicated first, and each
        |order emits at most once no matter how many late lines it has.
        |The year filter prunes orders scan-side before the join; the
        |final groupBy is over 5 priorities (trivial shuffle).""".stripMargin,
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // ----------------------------------------------------------------
    q("q107_late_suppliers",
      """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
        |shipdate-only lines: a supplier "kept an order waiting" when its
        |line shipped 60+ days after the order date, the order involved
        |more than one supplier, and no OTHER supplier in that order was
        |late. The classic formulation needs EXISTS + NOT EXISTS
        |self-joins of lineitem (three passes over the fact at 100 TB);
        |here both conditions collapse into aggregates: the join output
        |first reduces to DISTINCT (order, supplier, any-late) pairs,
        |then one aggregate per order key counts suppliers and late
        |suppliers and picks the late supplier's key. Two thin shuffles
        |— deliberately NOT one groupBy with two count(DISTINCT)s, which
        |Spark plans as a 3x Expand of the whole joined fact (3x the
        |shuffle volume at 100 TB; measured 1.7x slower at sf0.1). Only
        |single-late-supplier multi-supplier orders (a tiny set) reach
        |the broadcast supplier-name join. Top-20 is a TakeOrdered with
        |a name tie-break.""".stripMargin,
      """WITH j AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |g AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
        |    max(CASE WHEN late THEN l_suppkey END) AS late_supp
        |  FROM j GROUP BY 1)
        |SELECT s.s_name AS s_name, count(*) AS numwait
        |FROM g JOIN supplier s ON s.s_suppkey = g.late_supp
        |WHERE n_supp > 1 AND n_late = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"))
      val j = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      val pairs = j.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
      val g = pairs.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          max(when(col("late"), col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
      g.join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("late_supp"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    },

    // ----------------------------------------------------------------
    q("q180_volume_shipping",
      """TPC-H Q7 shape (volume shipping): cross-border revenue flow
        |per directed (supplier nation, customer nation) pair by ship
        |year — domestic trade excluded.  The two nation
        |dimensions broadcast onto opposite ends of the fact (supplier
        |side and customer side via orders); the OR over the two
        |direction tuples is applied AFTER both joins as one residual
        |predicate, so each dimension join stays a plain broadcast
        |equi-join.  Revenue is exact fixed-point (x10^4 — the scale-4
        |decimal of price x (1-discount) is integral there, so NEITHER
        |engine ever rounds); the year is
        |engine-neutral epoch extraction.  One hash shuffle for the
        |final (supp_nation, cust_nation, year) aggregate.""".stripMargin,
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) AS BIGINT)
        |    AS revenue_c4
        |FROM lineitem l
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE n1.n_name <> n2.n_name
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n), col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n), col("n_nationkey") === col("c_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("c_custkey") === col("o_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum((discPrice(col("l_extendedprice"), col("l_discount")) * 10000)
          .cast("long")).cast("long").as("revenue_c4"))
    },

    // ----------------------------------------------------------------
    q("q181_market_share",
      """TPC-H Q8 shape (national market share): within one customer
        |region and one part-type family, the share of yearly revenue
        |supplied by one nation — numerator and denominator as exact
        |cents riding ONE conditional aggregate (no second pass), the
        |share itself an integer ppm floor division.  Join order keeps
        |the fact outermost: part filter broadcast-semi-shrinks the
        |fact first (most selective), then supplier-nation tags the
        |numerator rows, then orders→customer→region gates the
        |denominator membership.  All dimensions broadcast.""".stripMargin,
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |    THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS nation_c4,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) AS BIGINT)
        |    AS total_c4,
        |  CAST((1000000 * CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |    THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
        |    ELSE 0 END) AS HUGEINT))
        |    // CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) AS HUGEINT)
        |    AS BIGINT) AS share_ppm
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier sp ON sp.s_suppkey = l.l_suppkey
        |JOIN nation n1 ON n1.n_nationkey = sp.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |JOIN region r ON r.r_regionkey = n2.n_regionkey
        |WHERE p.p_type LIKE 'ECONOMY%' AND r.r_name = 'ASIA'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val n = Tables.nation(s, dir)
      val pt = Tables.part(s, dir).filter(col("p_type").like("ECONOMY%"))
        .select(col("p_partkey"))
      val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val asiaCust = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
          col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")
          .select(col("r_regionkey"))),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("c_custkey"))
      val cents = (discPrice(col("l_extendedprice"), col("l_discount")) * 10000)
        .cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(asiaCust), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", cents).otherwise(0L))
            .cast("long").as("nation_c4"),
          sum(cents).cast("long").as("total_c4"))
        .select(col("o_year"), col("nation_c4"), col("total_c4"),
          // nation_c4 is a x10^4 fixed-point revenue sum; x10^6 overflows
          // int64 at large SF, so route the product through DECIMAL(38)
          // (HUGEINT in the oracle) — the q156/q179/q189 discipline.
          expr("CAST((1000000 * CAST(nation_c4 AS DECIMAL(38,0))) DIV total_c4 AS BIGINT)")
            .as("share_ppm"))
    },

    // ----------------------------------------------------------------
    q("q182_order_count_distribution",
      """TPC-H Q13 shape (customer distribution): the histogram of
        |orders-per-customer INCLUDING the zero bucket — the left outer
        |join whose unmatched side carries the answer (an inner join
        |would silently drop exactly the customers Q13 exists to count).
        |Adapted filter (the schema has no o_comment): non-URGENT
        |orders.  Two aggregates: per-customer count over the left
        |join (counting the order key, NULL on no-match, so zero
        |lands), then the count-of-counts — both one hash shuffle, the
        |second over |distinct counts| groups.""".stripMargin,
      """WITH co AS (
        |  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*)::BIGINT AS custdist
        |FROM co GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir).select(col("c_custkey"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(col("o_custkey"), col("o_orderkey")),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // ----------------------------------------------------------------
    q("q183_top_supplier",
      """TPC-H Q15 shape (top supplier): supplier(s) whose revenue in a
        |quarter EQUALS the global maximum — the
        |aggregate-join-scalar-max shape (Q15's view unnested).  Revenue
        |is exact integer cents, so the equality join against the max
        |is bit-safe (the double-typed original is notorious for
        |max-equality misses).  The per-supplier aggregate is one fact
        |shuffle; the scalar max broadcasts back onto it; the supplier
        |dimension broadcasts onto the (tiny) winner set.""".stripMargin,
      """WITH r AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) AS BIGINT)
        |      AS total_c4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1),
        |m AS (SELECT max(total_c4) AS mx FROM r)
        |SELECT s.s_suppkey, s.s_name, r.total_c4
        |FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey, m
        |WHERE r.total_c4 = m.mx""".stripMargin) { (s, dir) =>
      val r = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum((discPrice(col("l_extendedprice"), col("l_discount")) * 10000)
          .cast("long")).cast("long").as("total_c4"))
      val m = r.agg(max(col("total_c4")).as("mx"))
      r.crossJoin(broadcast(m))
        .filter(col("total_c4") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_c4"))
    },

    // ----------------------------------------------------------------
    q("q184_small_quantity_revenue",
      """TPC-H Q17 shape (small-quantity orders): revenue from lineitems
        |whose quantity is below a fifth of their part's average — the
        |correlated-average decorrelated into a per-part aggregate
        |joined back onto the fact (Spark would otherwise re-aggregate
        |per probe row).  The below-a-fifth test cross-multiplies
        |integers (5·qty·n < Σqty, quantities carried ×100) — no
        |division, no rounding choice for engines to disagree on.  The
        |brand filter broadcast-shrinks both the aggregate and the
        |probe to one brand's lineitems before the (small) self-join
        |on partkey.""".stripMargin,
      """WITH b AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
        |l AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q100,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem JOIN b ON p_partkey = l_partkey),
        |a AS (
        |  SELECT l_partkey, count(*)::BIGINT AS n,
        |    CAST(sum(q100) AS BIGINT) AS sum_q
        |  FROM l GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(sum(l.cents) AS BIGINT) AS revenue_cents,
        |  CAST(sum(l.cents) AS BIGINT) // 7 AS avg_yearly_cents
        |FROM l JOIN a ON a.l_partkey = l.l_partkey
        |WHERE 5 * l.q100 * a.n < a.sum_q""".stripMargin) { (s, dir) =>
      val b = Tables.part(s, dir).filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val l = Tables.lineitem(s, dir)
        .join(broadcast(b), col("p_partkey") === col("l_partkey"))
        .select(col("l_partkey"),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("q100"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val a = l.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), sum(col("q100")).cast("long").as("sum_q"))
      l.join(a.select(col("l_partkey"), col("n"), col("sum_q")), "l_partkey")
        .filter(lit(5L) * col("q100") * col("n") < col("sum_q"))
        .agg(count(lit(1)).as("n_small"),
          sum(col("cents")).cast("long").as("revenue_cents"))
        .select(col("n_small"), col("revenue_cents"),
          expr("revenue_cents DIV 7").as("avg_yearly_cents"))
    },

    // ----------------------------------------------------------------
    q("q185_product_profit",
      """TPC-H Q9 shape (product-type profit), adapted: the schema has
        |no partsupp, so unit cost proxies as the part's retail price
        |(documented adaptation, same join topology as the spec query).
        |Profit per (supplier nation, order year) = Σ revenue − cost,
        |BOTH as exact ×10⁴ fixed point (price×(1−disc) and
        |retail×quantity are scale-4 decimals — integral at ×10⁴, so
        |neither engine rounds anywhere).  Fact joins orders on its own
        |key; part (filtered to one type family) and supplier→nation
        |broadcast.  One final (nation, year) aggregate with map-side
        |combine.""".stripMargin,
      """SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)) AS BIGINT)
        |    AS revenue_c4,
        |  CAST(sum(CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
        |       * CAST(l.l_quantity AS DECIMAL(18,2)) * 10000 AS BIGINT)) AS BIGINT)
        |    AS cost_c4,
        |  CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
        |       * (1 - CAST(l.l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)
        |     - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
        |       * CAST(l.l_quantity AS DECIMAL(18,2)) * 10000 AS BIGINT)) AS BIGINT)
        |    AS profit_c4
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_type LIKE 'STANDARD%'
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val pt = Tables.part(s, dir).filter(col("p_type").like("STANDARD%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supp = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val revC4 = (discPrice(col("l_extendedprice"), col("l_discount")) * 10000)
        .cast("long")
      val costC4 = (col("p_retailprice").cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)") * 10000).cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(pt), col("p_partkey") === col("l_partkey"))
        .join(broadcast(supp), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(revC4).cast("long").as("revenue_c4"),
          sum(costC4).cast("long").as("cost_c4"),
          sum(revC4 - costC4).cast("long").as("profit_c4"))
    },

    // ----------------------------------------------------------------
    q("q187_supplier_promotion",
      """TPC-H Q20 shape (potential part promotion), adapted: with no
        |partsupp, "availability" is what the supplier actually shipped
        |— suppliers who moved MORE THAN HALF of a brand's 1997 volume
        |for at least one part.  Two-level aggregation ((part, supp)
        |then part totals joined back on the SAME part key — the second
        |join is co-partitioned with the first aggregate, no extra
        |exchange), cross-multiplied 2·supp_qty > part_qty test (no
        |division), then the survivor set rolls up per supplier and
        |broadcast-joins the name dimension.""".stripMargin,
      """WITH b AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'),
        |l AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q100
        |  FROM lineitem JOIN b ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
        |ps AS (
        |  SELECT l_partkey, l_suppkey, CAST(sum(q100) AS BIGINT) AS sq
        |  FROM l GROUP BY 1, 2),
        |pt AS (
        |  SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
        |  FROM ps GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name,
        |  count(*)::BIGINT AS n_dominant_parts,
        |  CAST(sum(ps.sq) AS BIGINT) AS dominated_q100
        |FROM ps JOIN pt ON pt.l_partkey = ps.l_partkey
        |JOIN supplier s ON s.s_suppkey = ps.l_suppkey
        |WHERE 2 * ps.sq > pt.tq
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val b = Tables.part(s, dir).filter(col("p_brand") === "Brand#2")
        .select(col("p_partkey"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(b), col("p_partkey") === col("l_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("q100"))
      val ps = l.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("q100")).cast("long").as("sq"))
      val pt = ps.groupBy(col("l_partkey"))
        .agg(sum(col("sq")).cast("long").as("tq"))
      ps.join(pt, "l_partkey")
        .filter(lit(2L) * col("sq") > col("tq"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_dominant_parts"),
          sum(col("sq")).cast("long").as("dominated_q100"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_dominant_parts"),
          col("dominated_q100"))
    },

    // ----------------------------------------------------------------
    q("q198_late_shipment_matrix",
      """TPC-H Q12 shape (shipping-mode priority matrix), adapted: the
        |schema has no shipmode/commitdate, so the pivot dimension is
        |ship LATENESS (shipped >90 days after order date vs on time)
        |and the measures are the spec's high/low order-priority
        |conditional counts.  The Q12 essence survives intact: ONE
        |fact-fact equi-join whose both conditional sums ride a single
        |aggregate pass — no second scan, no pivot operator, the
        |CASE-sum matrix shape.  The date arithmetic is engine-neutral
        |epoch micros (no INTERVAL-type semantics to disagree on).""".stripMargin,
      """SELECT (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
        |          > CAST(90 AS BIGINT) * 86400000000) AS late,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((unix_micros(col("l_shipdate").cast("timestamp")) -
          unix_micros(col("o_orderdate").cast("timestamp")) >
          lit(90L) * 86400000000L).as("late"))
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("long").as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("long").as("low_line_count"))
    },

    // ----------------------------------------------------------------
    q("q201_important_stock",
      """TPC-H Q11 shape (important stock), adapted: with no partsupp,
        |"stock value" is what actually moved — Σ quantity·price per
        |part from lineitem — and a part is important when its value
        |exceeds 1.5× the mean part share (the spec's fixed 1/10000
        |fraction is degenerate on uniform synthetic data — all-in at
        |small SF, empty at large; a mean-relative threshold is
        |scale-free, and this generator's part values top out near
        |1.9× mean).  The Q11 essence is intact: a
        |fraction-of-global-total HAVING where the per-group aggregate
        |joins a broadcast scalar and the threshold cross-multiplies
        |exact integers (2·n_parts·value > 3·total) — no division, no
        |float, no epsilon.  Value is ×10⁴ fixed point
        |(quantity×price is a scale-4 decimal — integral there, the
        |q180 discipline).  One fact shuffle on l_partkey; the scalar
        |total derives from THAT aggregate, so the fact scans
        |once.""".stripMargin,
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |         * CAST(l_extendedprice AS DECIMAL(18,2)) * 10000 AS BIGINT)) AS BIGINT)
        |      AS value_c4
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(value_c4) AS BIGINT) AS total,
        |             count(*)::BIGINT AS n_parts FROM pv)
        |SELECT pv.l_partkey, pv.value_c4,
        |  CAST((1000000 * CAST(pv.value_c4 AS HUGEINT)) // t.total AS BIGINT)
        |    AS share_ppm
        |FROM pv, t
        |WHERE 2 * t.n_parts * CAST(pv.value_c4 AS HUGEINT) > 3 * CAST(t.total AS HUGEINT)""".stripMargin) { (s, dir) =>
      val pv = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_quantity").cast("decimal(18,2)") *
            col("l_extendedprice").cast("decimal(18,2)") * 10000).cast("long"))
          .cast("long").as("value_c4"))
      val t = pv.agg(sum(col("value_c4")).cast("long").as("total"),
        count(lit(1)).as("n_parts"))
      pv.crossJoin(broadcast(t))
        .filter(expr(
          "2 * n_parts * CAST(value_c4 AS DECIMAL(38,0)) > 3 * CAST(total AS DECIMAL(38,0))"))
        .select(col("l_partkey"), col("value_c4"),
          expr("CAST((1000000 * CAST(value_c4 AS DECIMAL(38,0))) DIV total AS BIGINT)")
            .as("share_ppm"))
    },

    // ----------------------------------------------------------------
    q("q202_fulfillment_latency",
      """Order-to-ship LATENCY percentiles per order priority — the SLA
        |report a fulfillment dashboard leads with, computed EXACTLY by
        |the q170/q178 histogram-inversion discipline on the day-gap
        |domain (bounded by the order horizon, so the cumulative
        |windows run over per-priority histograms of at most a few
        |thousand day values no matter how many lineitems feed them).
        |One fact-fact equi-join, one (priority, gap_days) histogram
        |shuffle with map-side combine, then p50/p90/p99 as rank
        |inversions — every number an exact integer.""".stripMargin,
      """WITH g AS (
        |  SELECT o.o_orderpriority AS priority,
        |    (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 AS gap_days
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |hist AS (SELECT priority, gap_days, count(*)::BIGINT AS cnt
        |         FROM g GROUP BY 1, 2),
        |h2 AS (
        |  SELECT priority, gap_days, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY priority ORDER BY gap_days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY priority) AS BIGINT) AS n
        |  FROM hist)
        |SELECT priority, max(n) AS n_lines,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN gap_days END) AS p50_days,
        |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap_days END) AS p90_days,
        |  min(CASE WHEN cum >= (99 * n + 99) // 100 THEN gap_days END) AS p99_days,
        |  max(gap_days) AS max_days
        |FROM h2 GROUP BY 1""".stripMargin) { (s, dir) =>
      val hist = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"),
          expr("""(unix_micros(CAST(l_shipdate AS TIMESTAMP))
                 | - unix_micros(CAST(o_orderdate AS TIMESTAMP))) DIV 86400000000""".stripMargin)
            .as("gap_days"))
        .agg(count(lit(1)).as("cnt"))
      val cum = Window.partitionBy(col("priority")).orderBy(col("gap_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("priority"))
      hist
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("priority"))
        .agg(max(col("n")).as("n_lines"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("gap_days"))).as("p50_days"),
          min(when(expr("cum >= (9 * n + 9) DIV 10"), col("gap_days"))).as("p90_days"),
          min(when(expr("cum >= (99 * n + 99) DIV 100"), col("gap_days"))).as("p99_days"),
          max(col("gap_days")).as("max_days"))
    },

    // ----------------------------------------------------------------
    q("q252_benford_audit",
      """Benford first-digit audit of order totals (Benford 1938;
        |Nigrini 2012's forensic-accounting standard): the observed
        |leading-digit distribution of o_totalprice against Benford's
        |log10(1 + 1/d) expectation, per digit, with the signed
        |deviation — the data-quality screen an analytics warehouse
        |runs over any money column (fabricated or range-clipped
        |figures fail it; TPC-H's near-uniform price generator fails it
        |too, and the operator reports exactly that). Exactness: the
        |leading digit comes from floor() then BIGINT then the first
        |character of the decimal rendering — floor never changes the
        |leading digit of a value >= 1, double->string is never used,
        |and positive-BIGINT rendering is identical in both engines;
        |Benford expectations are integer permille literals (301..46).
        |Scale shape: one scan-side digit extraction, ONE 9-bucket agg
        |with map-side combine, a 9-row digit spine zero-fills, and the
        |1-row total broadcasts back. No window, no join wider than 9
        |rows.""".stripMargin,
      """WITH dg AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        |         AS BIGINT) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |obs AS (SELECT digit, count(*)::BIGINT AS n_orders FROM dg GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n FROM obs),
        |sp AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit)
        |SELECT sp.digit, coalesce(obs.n_orders, 0) AS n_orders,
        |  (1000 * coalesce(obs.n_orders, 0)) // coalesce(tot.n, 1) AS observed_pm,
        |  CASE sp.digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
        |    WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
        |    WHEN 8 THEN 51 ELSE 46 END AS benford_pm,
        |  (1000 * coalesce(obs.n_orders, 0)) // coalesce(tot.n, 1)
        |    - (CASE sp.digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
        |       WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
        |       WHEN 8 THEN 51 ELSE 46 END) AS delta_pm
        |FROM sp LEFT JOIN obs USING (digit) CROSS JOIN tot""".stripMargin) { (s, dir) =>
      val benford = """CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
        | WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
        | WHEN 8 THEN 51 ELSE 46 END""".stripMargin
      val obs = Tables.orders(s, dir)
        .filter(col("o_totalprice") >= 1)
        .select(expr(
          "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).cast("bigint").as("n_orders"))
      val tot = obs.agg(sum(col("n_orders")).cast("bigint").as("n"))
      val sp = s.range(1, 10).select(col("id").cast("bigint").as("digit"))
      sp.join(obs, Seq("digit"), "left")
        .crossJoin(broadcast(tot))
        .select(col("digit"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          expr("(1000 * coalesce(n_orders, CAST(0 AS BIGINT))) DIV coalesce(n, CAST(1 AS BIGINT))").as("observed_pm"),
          expr(benford).cast("bigint").as("benford_pm"),
          (expr("(1000 * coalesce(n_orders, CAST(0 AS BIGINT))) DIV coalesce(n, CAST(1 AS BIGINT))")
            - expr(benford)).cast("bigint").as("delta_pm"))
    },

    // ----------------------------------------------------------------
    q("q253_tpch_q6",
      """TPC-H Q6 shape — the forecasting-revenue-change query, the one
        |classic still missing from the shape catalog (Q2/Q16/Q20's
        |faithful forms need partsupp, which the driver data does not
        |ship): revenue that WOULD have been earned had discounts in a
        |band been eliminated — one scan, three pushable predicates,
        |one global sum. Exactness: the data's prices and discounts
        |carry <= 2 decimal digits, so both scale losslessly to integer
        |hundredths (DECIMAL(18,2) cast, x100, BIGINT — integral, so
        |neither engine's decimal->long rounding can diverge), the
        |discount-band predicate compares INTEGER hundredths (no
        |float-equality trap), and revenue comes out as an exact BIGINT
        |in 1e-4 units. Scale shape: this is THE predicate-pushdown
        |showcase — date + quantity reach the parquet scan as
        |PushedFilters, the scan prunes to three columns, and the
        |aggregate is a 1-row map-side-combined sum. Zero shuffles
        |beyond the final 1-row exchange.""".stripMargin,
      """SELECT count(*)::BIGINT AS n_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
        |       AS BIGINT) AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          expr("CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)").between(5, 7) &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).cast("bigint").as("n_lines"),
          sum(expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     |* CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)""".stripMargin))
            .cast("bigint").as("revenue_e4"))
    },

    // ----------------------------------------------------------------
    q("q261_rfm_segments",
      """RFM segmentation — the product-analytics staple (Hughes 1994;
        |the recency/frequency/monetary cube every CRM cuts customers
        |by) built value-exact: per customer, recency = days since
        |last order (vs the corpus max date — the 'as-of' a batch job
        |actually has), frequency = order count, monetary = exact
        |DECIMAL-cents total; each metric cut at its terciles and the
        |27 R x F x M cells reported with customer count, total cents
        |and total orders. Tercile boundaries are VALUE-based via the
        |q202/q204 histogram-inversion discipline — the three metrics
        |STACK into (metric, value) rows so the cumulative window
        |partitions by metric (never partition-less), its state
        |bounded by each metric's value DOMAIN (days in the horizon,
        |max order count, whole dollars — monetary is quantized to
        |dollars for the boundary domain), not by customer count;
        |ties at a boundary all land in the LOWER code, ceil(n/3) /
        |ceil(2n/3) ranks exactly as q204's terciles. The 3x2
        |threshold table pivots to ONE broadcast row and scoring is
        |scan-side CASE arithmetic over the staged customer frame
        |(consumed twice: histogram build + scoring). Code semantics:
        |1 = lowest value third — so R=1 is the MOST recent third,
        |F=3/M=3 the heaviest buyers. Scale shape: one custkey
        |shuffle, one domain-bounded histogram shuffle, a 1-row and a
        |1-row-of-6 broadcast, and a <= 27-group census.""".stripMargin,
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(max(epoch_us(o_orderdate)) // 86400000000 AS BIGINT) AS last_day,
        |    count(*)::BIGINT AS f,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |ref AS (SELECT CAST(max(last_day) AS BIGINT) AS ref_day FROM cust),
        |base AS (
        |  SELECT o_custkey, ref.ref_day - cust.last_day AS r, f, cents,
        |    cents // 100 AS dollars
        |  FROM cust, ref),
        |st AS (
        |  SELECT 'r' AS metric, r AS val FROM base
        |  UNION ALL SELECT 'f', f FROM base
        |  UNION ALL SELECT 'm', dollars FROM base),
        |hist AS (SELECT metric, val, count(*)::BIGINT AS cnt
        |         FROM st GROUP BY 1, 2),
        |h2 AS (
        |  SELECT metric, val, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY metric ORDER BY val
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY metric) AS BIGINT) AS n
        |  FROM hist),
        |th AS (
        |  SELECT metric,
        |    min(CASE WHEN cum >= (n + 2) // 3 THEN val END) AS t1,
        |    min(CASE WHEN cum >= (2 * n + 2) // 3 THEN val END) AS t2
        |  FROM h2 GROUP BY 1),
        |tp AS (
        |  SELECT max(CASE WHEN metric = 'r' THEN t1 END) AS r_t1,
        |    max(CASE WHEN metric = 'r' THEN t2 END) AS r_t2,
        |    max(CASE WHEN metric = 'f' THEN t1 END) AS f_t1,
        |    max(CASE WHEN metric = 'f' THEN t2 END) AS f_t2,
        |    max(CASE WHEN metric = 'm' THEN t1 END) AS m_t1,
        |    max(CASE WHEN metric = 'm' THEN t2 END) AS m_t2
        |  FROM th),
        |sc AS (
        |  SELECT
        |    CASE WHEN r <= r_t1 THEN 1 WHEN r <= r_t2 THEN 2 ELSE 3 END AS r_code,
        |    CASE WHEN f <= f_t1 THEN 1 WHEN f <= f_t2 THEN 2 ELSE 3 END AS f_code,
        |    CASE WHEN dollars <= m_t1 THEN 1 WHEN dollars <= m_t2 THEN 2 ELSE 3 END AS m_code,
        |    f, cents
        |  FROM base, tp)
        |SELECT r_code, f_code, m_code, count(*)::BIGINT AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  CAST(sum(f) AS BIGINT) AS total_orders
        |FROM sc GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val cust = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          expr("CAST(max(unix_micros(CAST(o_orderdate AS TIMESTAMP))) DIV 86400000000 AS BIGINT)")
            .as("last_day"),
          count(lit(1)).cast("bigint").as("f"),
          sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("bigint").as("cents"))
      val ref = cust.agg(max(col("last_day")).cast("bigint").as("ref_day"))
      val base = cust.crossJoin(broadcast(ref))
        .select(col("o_custkey"),
          (col("ref_day") - col("last_day")).as("r"),
          col("f"), col("cents"),
          expr("cents DIV 100").as("dollars"))
        .transform(graft.Graft.stagedCheckpoint) // histogram build + scoring
      val st = base.select(
        expr("stack(3, 'r', r, 'f', f, 'm', dollars) AS (metric, val)"))
      val cum = Window.partitionBy(col("metric")).orderBy(col("val"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("metric"))
      val th = st.groupBy(col("metric"), col("val"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("metric"))
        .agg(min(when(col("cum") >= expr("(n + 2) DIV 3"), col("val"))).as("t1"),
          min(when(col("cum") >= expr("(2 * n + 2) DIV 3"), col("val"))).as("t2"))
      val tp = th.agg(
        max(when(col("metric") === "r", col("t1"))).as("r_t1"),
        max(when(col("metric") === "r", col("t2"))).as("r_t2"),
        max(when(col("metric") === "f", col("t1"))).as("f_t1"),
        max(when(col("metric") === "f", col("t2"))).as("f_t2"),
        max(when(col("metric") === "m", col("t1"))).as("m_t1"),
        max(when(col("metric") === "m", col("t2"))).as("m_t2"))
      base.crossJoin(broadcast(tp))
        .select(
          expr("CASE WHEN r <= r_t1 THEN 1 WHEN r <= r_t2 THEN 2 ELSE 3 END").as("r_code"),
          expr("CASE WHEN f <= f_t1 THEN 1 WHEN f <= f_t2 THEN 2 ELSE 3 END").as("f_code"),
          expr("CASE WHEN dollars <= m_t1 THEN 1 WHEN dollars <= m_t2 THEN 2 ELSE 3 END").as("m_code"),
          col("f"), col("cents"))
        .groupBy(col("r_code"), col("f_code"), col("m_code"))
        .agg(count(lit(1)).cast("bigint").as("n_customers"),
          sum(col("cents")).cast("bigint").as("total_cents"),
          sum(col("f")).cast("bigint").as("total_orders"))
    },

    // ----------------------------------------------------------------
    q("q268_order_backlog",
      """Open-order BACKLOG curve — the fulfillment-ops daily chart
        |(how many orders are in flight, entering, and leaving, and
        |how much money is tied up in them): an order is open from its
        |order date until its LAST line ships (q202 measures the
        |latency distribution of exactly this interval; this query
        |materializes the concurrency it implies). Unlike q265 (whose
        |per-hour DISTINCT-user census is not decomposable into
        |boundary marks), every output column here is a pure interval
        |sum — so instead of exploding each order across its whole
        |[order_day, last_ship_day] span (orders × avg-latency rows;
        |the explode+partial-agg was 2/3 of this query's r15 cost and
        |scales with latency), each order emits exactly TWO boundary
        |marks (+1/cents at open_day, close marks at close_day), the
        |day-keyed census aggregate reduces them with map-side combine
        |to ≤ horizon-days rows, and the standing counts come back via
        |the DistributedRank dense-pid prefix-sum discipline:
        |n_open(d) = cumOpens(d) − cumCloses(d−1) (inclusive close).
        |Days inside [min open, max close] that no span covers carry
        |n_open = 0 and are filtered — exactly the days the explode
        |never emitted. The close day is clamped to >= the open day so
        |both engines agree on degenerate spans (Spark's sequence()
        |counts DOWN when end < start, DuckDB's generate_series
        |returns empty — the clamp removes the divergence class; the
        |oracle keeps the explode formulation, so the hash match
        |proves the boundary-mark rewrite census-invisible). Scale
        |shape: orders ⋈ lineitem is key-co-partitioned (one shuffle
        |pair), boundary marks are 2 rows per order (latency-
        |independent), everything after the census is horizon-bounded
        |(day spine ≤ horizon days; the prefix sum is the dense-pid
        |window — npart-way parallel, never partition-less — plus the
        |triangular offset join over npart rows).""".stripMargin,
      """WITH o AS (
        |  SELECT o.o_orderkey,
        |    epoch_us(o.o_orderdate) // 86400000000 AS open_day,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    greatest(max(epoch_us(l.l_shipdate) // 86400000000),
        |             epoch_us(o.o_orderdate) // 86400000000) AS close_day
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2, 3),
        |x AS (SELECT open_day, close_day, cents,
        |        unnest(generate_series(open_day, close_day)) AS day
        |      FROM o)
        |SELECT day, count(*)::BIGINT AS n_open,
        |  CAST(sum(CASE WHEN day = open_day THEN 1 ELSE 0 END) AS BIGINT) AS n_opening,
        |  CAST(sum(CASE WHEN day = close_day THEN 1 ELSE 0 END) AS BIGINT) AS n_closing,
        |  CAST(sum(cents) AS BIGINT) AS open_value_cents
        |FROM x GROUP BY 1""".stripMargin) { (s, dir) =>
      // lineitem pre-aggregates to its per-order LAST ship day BEFORE
      // the join (map-side combine on the scan), so the join is 1:1 on
      // the order key and nothing re-shuffles after it — the old
      // join-then-group shape shuffled the joined fact a second time
      val lastShip = Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000000")
            .as("ship_day"))
        .groupBy(col("l_orderkey"))
        .agg(max(col("ship_day")).as("ship_day"))
      val spans = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
            .as("open_day"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
        .join(lastShip, col("l_orderkey") === col("o_orderkey"))
        .select(col("open_day"),
          greatest(col("ship_day"), col("open_day")).as("close_day"),
          col("cents"))
      // two boundary marks per order out of ONE pass (explode over a
      // 2-struct array, not a self-union that would re-run the join),
      // reduced to the ≤ horizon-days census with map-side combine.
      // A single-day span contributes both marks to the same day;
      // the n_open formula below counts it exactly once.
      val census = spans
        .select(explode(array(
          struct(col("open_day").as("day"), lit(1L).as("no"),
            col("cents").as("co"), lit(0L).as("ncl"), lit(0L).as("ccl")),
          struct(col("close_day").as("day"), lit(0L).as("no"),
            lit(0L).as("co"), lit(1L).as("ncl"), col("cents").as("ccl"))))
          .as("b"))
        .select(col("b.day").as("day"), col("b.no").as("no"),
          col("b.co").as("co"), col("b.ncl").as("ncl"), col("b.ccl").as("ccl"))
        .groupBy(col("day"))
        .agg(sum(col("no")).as("no"), sum(col("co")).as("co"),
          sum(col("ncl")).as("ncl"), sum(col("ccl")).as("ccl"))
        // two consumers below (bounds + the spine join) must not re-run
        // the orders ⋈ lineitem lineage; the frame is horizon-bounded
        .transform(graft.Graft.stagedCheckpoint)
      // dense day spine over [min open_day, max close_day] (close >=
      // open by the clamp, so min(day)/max(day) are exactly those);
      // arithmetic pid — no range sampler, no partition-less window.
      // nPart comes from the shuffle-partition conf, NOT
      // defaultParallelism: results are invariant either way, but a
      // host-CPU-derived constant bakes the machine's core count into
      // the plan text and partition layout (ADVICE r16 — plan
      // snapshots churned across hosts); the conf is pinned per
      // session and scales on a real cluster.
      val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
      val spine = census
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("day"),
          col("lo"), col("hi"))
        .select(col("day"),
          expr(s"CAST((day - lo) * $nPart DIV (hi - lo + 1) AS INT)").as("pid"))
      val filled = spine
        .join(broadcast(census), Seq("day"), "left")
        .select(col("day"), col("pid"),
          coalesce(col("no"), lit(0L)).as("no"),
          coalesce(col("co"), lit(0L)).as("co"),
          coalesce(col("ncl"), lit(0L)).as("ncl"),
          coalesce(col("ccl"), lit(0L)).as("ccl"))
      // per-pid local running sums (npart-way parallel window) + the
      // triangular per-pid offsets = global inclusive prefix sums; both
      // branches re-derive `filled` from the checkpointed census, so
      // the heavy lineage never re-runs
      val w = Window.partitionBy(col("pid")).orderBy(col("day"))
      val ptot = filled.groupBy(col("pid"))
        .agg(sum(col("no")).as("tno"), sum(col("co")).as("tco"),
          sum(col("ncl")).as("tncl"), sum(col("ccl")).as("tccl"))
      val offs = ptot.as("a")
        .join(ptot.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.tno")), lit(0L)).as("ono"),
          coalesce(sum(col("b.tco")), lit(0L)).as("oco"),
          coalesce(sum(col("b.tncl")), lit(0L)).as("oncl"),
          coalesce(sum(col("b.tccl")), lit(0L)).as("occl"))
      filled
        .withColumn("lno", sum(col("no")).over(w))
        .withColumn("lco", sum(col("co")).over(w))
        .withColumn("lncl", sum(col("ncl")).over(w))
        .withColumn("lccl", sum(col("ccl")).over(w))
        .join(broadcast(offs), Seq("pid"))
        // open on day d: opened on or before d, closed on or after d —
        // cumOpens(d) − (cumCloses(d) − closes(d)); value identically
        .select(col("day"),
          (col("ono") + col("lno") - (col("oncl") + col("lncl")) + col("ncl"))
            .cast("bigint").as("n_open"),
          col("no").cast("bigint").as("n_opening"),
          col("ncl").cast("bigint").as("n_closing"),
          (col("oco") + col("lco") - (col("occl") + col("lccl")) + col("ccl"))
            .cast("bigint").as("open_value_cents"))
        .filter(col("n_open") > 0L)
    },

    // ----------------------------------------------------------------
    q("q269_reorder_cycle",
      """Reorder-cycle distribution — the purchase-cadence report
        |behind replenishment forecasting and q261's R threshold
        |choice: per calendar YEAR (of the earlier order), the gaps in
        |days between a customer's consecutive orders, as exact
        |p50/p90/max plus the mean, via the q202 histogram-inversion
        |discipline on the (year, gap_days) domain. Ordering within a
        |customer is the suite's total order (epoch day, order key).
        |Scale shape: ONE customer-keyed window pass computes the
        |gaps; the histogram shuffle carries (year, gap_days) with
        |map-side combine — bounded by horizon-years × latency-days,
        |never by order count; the roll-up is |years| rows.""".stripMargin,
      """WITH o AS (
        |  SELECT o_custkey, year(o_orderdate) AS yr,
        |    epoch_us(o_orderdate) // 86400000000 AS day,
        |    lag(epoch_us(o_orderdate) // 86400000000) OVER w AS prev_day,
        |    lag(year(o_orderdate)) OVER w AS prev_yr
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey)),
        |g AS (SELECT prev_yr AS yr, day - prev_day AS gap_days FROM o
        |      WHERE prev_day IS NOT NULL),
        |hist AS (SELECT yr, gap_days, count(*)::BIGINT AS cnt
        |         FROM g GROUP BY 1, 2),
        |h2 AS (SELECT yr, gap_days, cnt,
        |         CAST(sum(cnt) OVER (PARTITION BY yr ORDER BY gap_days
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum,
        |         CAST(sum(cnt) OVER (PARTITION BY yr) AS BIGINT) AS n
        |       FROM hist)
        |SELECT yr, max(n) AS n_gaps,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN gap_days END) AS p50_days,
        |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN gap_days END) AS p90_days,
        |  max(gap_days) AS max_days,
        |  CAST(sum(gap_days * cnt) AS BIGINT) // max(n) AS mean_days
        |FROM h2 GROUP BY 1""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"), col("o_orderkey"))
      val hist = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          year(col("o_orderdate")).as("yr0"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
            .as("day"))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          lag(col("day"), 1).over(w).as("prev_day"),
          lag(col("yr0"), 1).over(w).as("yr"))
        .filter(col("prev_day").isNotNull)
        .groupBy(col("yr"), (col("day") - col("prev_day")).as("gap_days"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
      val cum = Window.partitionBy(col("yr")).orderBy(col("gap_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(col("yr"))
      hist
        .withColumn("cum", sum(col("cnt")).over(cum).cast("long"))
        .withColumn("n", sum(col("cnt")).over(whole).cast("long"))
        .groupBy(col("yr"))
        .agg(max(col("n")).as("n_gaps"),
          min(when(expr("cum >= (n + 1) DIV 2"), col("gap_days"))).as("p50_days"),
          min(when(expr("cum >= (9 * n + 9) DIV 10"), col("gap_days"))).as("p90_days"),
          max(col("gap_days")).as("max_days"),
          expr("CAST(sum(gap_days * cnt) AS BIGINT) DIV max(n)").as("mean_days"))
    })
}
