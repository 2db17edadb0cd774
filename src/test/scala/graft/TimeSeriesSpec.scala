package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries.HoltState

/** Brute-force recomputes of the time-series tier (q278-q281): each
  * statistic re-derived in plain Scala from the collected fixture with
  * the same integer arithmetic, plus partitioning invariance.
  */
class TimeSeriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  private def rows: Seq[(String, Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts)"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("q278 TWAP equals a sorted same-day interval walk") {
    val got = byName("q278_twap").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val exp = rows.groupBy(_._1).flatMap { case (t, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val ivs = sorted.zip(sorted.drop(1)).map { case (a, b) =>
        (a._2 / 86400000000L, b._2 / 86400000000L, b._2 - a._2, a._4)
      }.filter(iv => iv._1 == iv._2 && iv._3 > 0)
      ivs.groupBy(_._1).map { case (day, xs) =>
        val dur = xs.map(_._3).sum
        val num = xs.map(x => BigInt(x._4) * x._3).sum
        (t, day) -> ((xs.size.toLong, dur, (num / dur).toLong))
      }
    }
    assert(got == exp, "TWAP census diverges from the interval walk")
    assert(got.nonEmpty)
  }

  test("q279 OHLC bars equal a sorted per-bar walk") {
    val got = byName("q279_ohlc_bars").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    val exp = rows.groupBy(e => (e._1, e._2 / 3600000000L)).map { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val cents = sorted.map(_._4)
      k -> ((cents.size.toLong, sorted.head._4, cents.max, cents.min,
        sorted.last._4, cents.sum / cents.size))
    }
    assert(got == exp, "OHLC bars diverge from the per-bar walk")
    // high >= max(open, close), low <= min(open, close), every bar
    got.values.foreach { case (_, o, hi, lo, c, m) =>
      assert(hi >= math.max(o, c) && lo <= math.min(o, c) && m >= lo && m <= hi)
    }
  }

  test("q280 correlation equals a BigInt moment recompute over the dense spine") {
    val counts = rows.groupBy(e => (e._1, e._2 / 3600000000L))
      .map { case (k, v) => k -> v.size.toLong }
    val hours = counts.keys.map(_._2)
    val spine = (hours.min to hours.max).toSeq
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    val got = byName("q280_type_correlation").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    for (Seq(ta, tb) <- types.combinations(2)) {
      val xs = spine.map(h => counts.getOrElse((ta, h), 0L))
      val ys = spine.map(h => counts.getOrElse((tb, h), 0L))
      val n = BigInt(spine.size)
      val (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val syy = ys.map(y => BigInt(y) * y).sum
      val num = n * sxy - sx * sy
      val d1 = (n * sxx - sx * sx).max(1)
      val d2 = (n * syy - sy * sy).max(1)
      val r2 = (BigInt(1000000) * num * num / (d1 * d2)).toLong
      assert(got((ta, tb)) ==
        ((spine.size.toLong, num.toLong, num.signum.toLong, r2)), s"pair $ta/$tb")
    }
  }

  test("q281 Holt census equals the shared HoltState fold over the spine") {
    val counts = rows.groupBy(e => (e._1, e._2 / 3600000000L))
      .map { case (k, v) => k -> v.size.toLong }
    val got = byName("q281_holt_linear").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    for (t <- counts.keys.map(_._1).toSeq.distinct) {
      val hs = counts.keys.filter(_._1 == t).map(_._2)
      val st = (hs.min to hs.max).foldLeft(HoltState.empty) { (s, h) =>
        s.step(counts.getOrElse((t, h), 0L))
      }
      assert(got(t) == ((st.n, st.l, st.b, st.l + st.b, st.sae,
        st.sae / math.max(st.n - 1, 1))), s"type $t")
    }
  }

  test("q287 decomposition equals a brute-force MA walk; indices center") {
    val counts = rows.groupBy(e => (e._1, e._2 / 3600000000L))
      .map { case (k, v) => k -> v.size.toLong }
    def sdiv(a: Long, b: Long): Long = if (a >= 0) a / b else -((-a) / b)
    val exp = counts.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val hs = counts.keys.filter(_._1 == t).map(_._2)
      val spine = (hs.min to hs.max).map(h => h -> counts.getOrElse((t, h), 0L))
      val ys = spine.map(_._2)
      val ds = spine.indices.flatMap { i =>
        if (i >= 12 && i + 12 < spine.size) {
          val s1 = (i - 12 to i + 11).map(ys).sum
          val s2 = (i - 11 to i + 12).map(ys).sum
          Some((spine(i)._1 % 24, 1000L * ys(i) - (1000L * (s1 + s2)) / 48L))
        } else None
      }
      val sr = ds.groupBy(_._1).map { case (hod, xs) =>
        (hod, xs.size.toLong, sdiv(xs.map(_._2).sum, xs.size))
      }.toSeq
      val sMean = sdiv(sr.map(_._3).sum, sr.size)
      sr.map { case (hod, n, raw) => (t, hod) -> ((n, raw, raw - sMean)) }
    }.toMap
    val got = byName("q287_classical_decomposition").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, "decomposition diverges from the MA walk")
    // centered indices sum to ~0 per type (exact up to 24 truncations)
    got.keys.map(_._1).toSeq.distinct.foreach { t =>
      val s = got.collect { case ((`t`, _), (_, _, c)) => c }.sum
      assert(math.abs(s) <= 24, s"$t seasonal indices should center near 0: $s")
    }
  }

  test("q288 lead-lag equals a brute-force lag sweep with the exact tie-break") {
    val counts = rows.groupBy(e => (e._1, e._2 / 3600000000L))
      .map { case (k, v) => k -> v.size.toLong }
    val hours = counts.keys.map(_._2)
    val spine = (hours.min to hours.max).toSeq
    val types = counts.keys.map(_._1).toSeq.distinct.sorted
    def series(t: String) = spine.map(h => counts.getOrElse((t, h), 0L))
    val got = byName("q288_lead_lag").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    for (Seq(ta, tb) <- types.combinations(2)) {
      val (xs, ys) = (series(ta), series(tb))
      def r2At(lag: Int): (Long, Long, Long) = { // (n, sign, r2_ppm)
        val pairs = spine.indices.flatMap { i =>
          val j = i + lag
          if (j >= 0 && j < spine.size) Some((xs(i), ys(j))) else None
        }
        val n = BigInt(pairs.size)
        val sx = BigInt(pairs.map(_._1).sum); val sy = BigInt(pairs.map(_._2).sum)
        val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
        val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
        val syy = pairs.map(p => BigInt(p._2) * p._2).sum
        val num = n * sxy - sx * sy
        val r2 = (BigInt(1000000) * num * num /
          ((n * sxx - sx * sx).max(1) * (n * syy - sy * sy).max(1))).toLong
        (pairs.size.toLong, num.signum.toLong, r2)
      }
      val all = (-6 to 6).map(l => l -> r2At(l))
      val best = all.map(_._2._3).max
      val bestLag = all.filter(_._2._3 == best).map(_._1).min
      val (n, sign, r2) = r2At(bestLag)
      assert(got((ta, tb)) == ((bestLag.toLong, n, sign, r2, r2At(0)._3)),
        s"pair $ta/$tb")
    }
  }

  test("r2PpmExpr rescaled branch matches BigInt (≡ DuckDB HUGEINT) arithmetic") {
    // ADVICE r15: the ELSE branch used to square the DIV quotients in
    // 64-bit long (Spark's IntegralDivide returns BIGINT even on
    // DECIMAL(38,0) operands) and silently wrapped past quotient
    // ~3.03e6, diverging from DuckDB's exact HUGEINT `//`. This series
    // is engineered to land in the rescaled branch (|num| > 3e15) with
    // a quotient far past the old wrap point, and the assertion mirrors
    // the branch in BigInt — exactly what DuckDB computes at these
    // widths (every intermediate < 1e38).
    val n = 5000
    val xs = (0 until n).map(i => 1000000L + 200L * i)
    val ys = (0 until n).map(i => 500000L + i.toLong)
    val (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val sxx = xs.map(x => BigInt(x) * x).sum
    val syy = ys.map(y => BigInt(y) * y).sum
    Seq(sx, sy, sxy, sxx, syy).foreach(v => assert(v.isValidLong))
    val num = BigInt(n) * sxy - sx * sy
    val dx = BigInt(n) * sxx - sx * sx
    val dy = BigInt(n) * syy - sy * sy
    assert(num.abs > BigInt("3000000000000000"),
      s"fixture must land in the rescaled branch, num=$num")
    val qn = num.abs / n
    assert(qn > 3030000L, s"quotient must exceed the old 64-bit wrap point, qn=$qn")
    val exp = (BigInt(1000000) * qn * qn /
      ((dx / n).max(1) * (dy / n).max(1))).toLong
    val s = spark
    import s.implicits._
    val got = Seq((n.toLong, sx.toLong, sy.toLong, sxy.toLong, sxx.toLong, syy.toLong))
      .toDF("n", "sx", "sy", "sxy", "sxx", "syy")
      .selectExpr(s"(${graft.operators.TimeSeries.r2PpmSpark}) AS r2")
      .head.getLong(0)
    assert(got == exp, s"Spark rescaled branch $got != BigInt/HUGEINT $exp")
    // and it is a sane r² for a perfectly-correlated pair: ~1e6 ppm
    assert(got > 900000L && got <= 1000000L, s"r2_ppm out of range: $got")
  }

  test("time-series queries are partitioning-invariant") {
    for (n <- Seq("q280_type_correlation", "q281_holt_linear")) {
      val d = byName(n)
      val a = withSQLConf("spark.sql.shuffle.partitions" -> "1") {
        d.run(spark, sfDir).collect().map(_.toString).sorted.toSeq
      }
      val b = withSQLConf("spark.sql.shuffle.partitions" -> "7") {
        d.run(spark, sfDir).collect().map(_.toString).sorted.toSeq
      }
      assert(a == b && a.nonEmpty, s"$n must be a pure function of the data")
    }
  }
}
