package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the round-10 TPC-H classics (q180-q184).
  * Value-level correctness is pinned by the DuckDB oracles; these tests
  * pin the properties that make each shape the RIGHT answer — the
  * conservation laws an implementation bug would break first.
  */
class TpchClassicsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  test("q180: no domestic flows; totals conserve the filtered cross-border revenue") {
    val rows = byName("q180_volume_shipping").run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) != r.getString(1), "domestic pair leaked"))
    val years = rows.map(_.getLong(2)).distinct.sorted
    assert(years.forall(y => y == 1996L || y == 1997L), s"years $years")
  }

  test("q181: numerator bounded by denominator; share recomputes") {
    val rows = byName("q181_market_share").run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "nation share exceeds total")
      assert(r.getLong(3) == 1000000L * r.getLong(1) / r.getLong(2), "share_ppm")
    }
  }

  test("q182: histogram conserves the customer population incl. zero bucket") {
    val rows = byName("q182_order_count_distribution").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.values.sum == nCust, "customers not conserved")
    // orders-per-customer recompute: total orders (non-urgent) must match
    val nOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map { case (c, d) => c * d }.sum == nOrders,
      "weighted histogram must equal the filtered order count")
  }

  test("q183: winners carry exactly the max quarterly revenue") {
    val rows = byName("q183_top_supplier").run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((graft.functions.Fns.discPrice(col("l_extendedprice"),
        col("l_discount")) * 10000).cast("long")).as("c4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mx = revs.values.max
    assert(rows.map(_.getLong(2)).toSet == Set(mx))
    assert(rows.map(_.getLong(0)).toSet == revs.filter(_._2 == mx).keySet)
  }

  test("q184: small-quantity set equals a brute-force per-part recompute") {
    val li = Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_partkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = li.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val small = li.filter { case (p, q, _) =>
      val (n, sq) = byPart(p); 5 * q * n < sq
    }
    val r = byName("q184_small_quantity_revenue").run(spark, sfDir).collect()(0)
    assert(r.getLong(0) == small.size.toLong, "n_small")
    assert(r.getLong(1) == small.map(_._3).sum, "revenue_cents")
    assert(r.getLong(2) == small.map(_._3).sum / 7, "avg_yearly_cents")
  }

  test("q185: profit = revenue - cost on every row; both sides nonzero") {
    val rows = byName("q185_product_profit").run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) == r.getLong(4), "profit identity")
      assert(r.getLong(2) > 0 && r.getLong(3) > 0, "degenerate row")
    }
  }

  test("q187: dominance equals a brute-force two-level recompute") {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(broadcast(Tables.part(spark, sfDir)
        .filter(col("p_brand") === "Brand#2").select(col("p_partkey"))),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySuppPart = li.groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    val byPart = li.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expected = bySuppPart.toSeq
      .filter { case ((p, _), sq) => 2 * sq > byPart(p) }
      .groupBy(_._1._2).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val got = byName("q187_supplier_promotion").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, "dominant-supplier set diverges from brute force")
    assert(got.nonEmpty, "fixture should have dominant suppliers")
  }

  test("q198: lateness matrix conserves the joined fact") {
    val rows = byName("q198_late_shipment_matrix").run(spark, sfDir).collect()
      .map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(true, false), "both lateness buckets present")
    val nLines = Tables.lineitem(spark, sfDir).count()
    assert(rows.values.map(v => v._1 + v._2).sum == nLines,
      "matrix must conserve every lineitem exactly once")
    val nHigh = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey").as("l_orderkey")), "l_orderkey").count()
    assert(rows.values.map(_._1).sum == nHigh, "high-priority total")
  }

  test("q201: survivors are exactly the above-1.5x-mean parts") {
    val pv = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_quantity").cast("decimal(18,2)") *
          col("l_extendedprice").cast("decimal(18,2)") * 10000).cast("long"))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = BigInt(pv.values.sum); val n = BigInt(pv.size)
    val expected = pv.filter { case (_, v) => 2 * n * v > 3 * total }
    val got = byName("q201_important_stock").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toMap == expected,
      "survivor set diverges from brute force")
    assert(got.nonEmpty && got.length < pv.size,
      "threshold must be discriminating on this fixture")
    got.foreach { case (_, v, ppm) =>
      assert(ppm == (BigInt(1000000) * v / total).toLong, "share_ppm")
    }
  }

  test("q202 latency percentiles equal sorted order statistics per priority") {
    val gaps = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        expr("""(unix_micros(CAST(l_shipdate AS TIMESTAMP))
               | - unix_micros(CAST(o_orderdate AS TIMESTAMP))) DIV 86400000000""".stripMargin))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val expected = gaps.map { case (p0, gs) =>
      val n = gs.size.toLong
      def at(k: Long) = gs((k - 1).toInt)
      p0 -> ((n, at((n + 1) / 2), at((9 * n + 9) / 10), at((99 * n + 99) / 100), gs.last))
    }
    val got = byName("q202_fulfillment_latency").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "latency percentiles diverge from sorted order stats")
    got.values.foreach { case (_, p50, p90, p99, mx) =>
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx, "percentiles must be monotone")
    }
  }

  test("TPC-H classics are registered with oracles") {
    Seq("q180_volume_shipping", "q181_market_share",
      "q182_order_count_distribution", "q183_top_supplier",
      "q184_small_quantity_revenue", "q185_product_profit",
      "q187_supplier_promotion", "q198_late_shipment_matrix",
      "q201_important_stock", "q202_fulfillment_latency").foreach { n =>
      assert(SparkEntry.queries.contains(n), n)
      assert(SparkEntry.oracleSql.contains(n), n)
    }
  }
}
