package graft

import org.apache.spark.sql.functions.col

/** q223 seed-scoped link prediction checked against a plain-Scala
  * recompute of the whole chain (co-purchase edges → degrees → top-50
  * seeds → wedge scores → non-adjacent filter → top-10 per seed) with
  * the SAME integer arithmetic — independent of both the Spark plan and
  * the DuckDB oracle. Plus the semantic invariants that make the
  * recommendations trustworthy: no recommended pair is an existing
  * edge, no self-recommendations, and every score is achievable
  * (cn ≥ 1, ra_micro ≤ cn · 10⁶ / min-degree).
  */
class LinkPredictionSpec extends SparkSpec {

  private val sfDir = TestSession.sfDir

  private lazy val edges: Set[(Long, Long)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.flatMap { ls =>
        val ps = ls.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
      }.toSet

  private lazy val rows: Seq[(Long, Long, Long, Long, Long)] =
    SparkEntry.all.find(_.name == "q223_link_prediction").get
      .run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  test("q223 equals a Scala recompute of seeds, wedges and ranks") {
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val seeds = deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(50).map(_._1)
    val expected = seeds.flatMap { s =>
      val scores = adj(s).toSeq.flatMap { z =>
        (adj(z) - s).toSeq.map(c => (c, z))
      }.groupBy(_._1).view
        .filterKeys(c => !adj(s).contains(c))
        .mapValues { zs =>
          (zs.size.toLong, zs.map { case (_, z) => 1000000L / deg(z) }.sum)
        }.toSeq
      scores.sortBy { case (c, (cn, ra)) => (-cn, -ra, c) }
        .take(10).zipWithIndex
        .map { case ((c, (cn, ra)), i) => (s, c, cn, ra, i + 1L) }
    }.toSet
    assert(rows.toSet == expected,
      "link-prediction rows diverge from the Scala recompute")
  }

  test("q223 invariants: non-edges only, no self-links, achievable scores") {
    assert(rows.nonEmpty, "the dense co-purchase graph must yield candidates")
    rows.foreach { case (s, c, cn, ra, rk) =>
      assert(s != c, "no self-recommendations")
      val key = if (s < c) (s, c) else (c, s)
      assert(!edges.contains(key), s"($s,$c) is already an edge")
      assert(cn >= 1 && rk >= 1 && rk <= 10)
      assert(ra >= 0 && ra <= cn * 1000000L,
        "RA must be bounded by cn microunits (deg >= 1)")
    }
    // within a seed, rank order must follow (cn desc, ra desc, cand)
    rows.groupBy(_._1).values.foreach { rs =>
      val byRank = rs.sortBy(_._5).map(r => (-r._3, -r._4, r._2))
      assert(byRank == byRank.sorted, "rank order must match the sort key")
    }
  }
}
