package graft

import org.apache.spark.sql.functions._

/** Brute-force reference checks for the events analytics tier's
  * window-based operators (q148 streaks, q149 rolling anomaly): the
  * distributed islands/frame arithmetic must equal a driver-side
  * recomputation from first principles on the same data.
  */
class EventsAnalyticsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  test("q148 streaks equal a driver-side consecutive-run scan per user") {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate.toEpochDay)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap

    val expected = days.map { case (u, ds) =>
      // longest run of consecutive epoch-days in the sorted distinct list
      val longest = ds.foldLeft((0L, 0L, Long.MinValue)) {
        case ((best, cur, prev), d) =>
          val run = if (d == prev + 1) cur + 1 else 1L
          (math.max(best, run), run, d)
      }._1
      u -> (ds.size.toLong, longest)
    }

    val got = byName("q148_active_streaks").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "streaks diverge from brute force")
    // sanity: at least one user has a streak > 1 at this SF, so the
    // islands grouping is actually exercised
    assert(got.values.exists(_._2 > 1), "no multi-day streak in fixture")
  }

  test("q149 anomaly flags equal a brute-force trailing-frame recompute") {
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val byUser = evs.groupBy(_._2)
    val expected = evs.map { case (id, u, t, x) =>
      // exclusive RANGE frame: strictly-earlier rows of the same user
      // within 6h — the event and its timestamp peers are NOT in it
      val frame = byUser(u).filter(e => e._3 >= t - 21600000000L && e._3 < t)
      val n = frame.size.toLong
      val s = frame.map(_._4).sum
      val q = frame.map(e => e._4 * e._4).sum
      val dev2 = (n * x - s) * (n * x - s)
      val thr = 9 * (n * q - s * s)
      id -> ((n, dev2, thr, if (n >= 5 && dev2 > thr) 1 else 0))
    }.toMap

    val got = byName("q149_rolling_anomaly").run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(got == expected, "anomaly frame arithmetic diverges from brute force")
  }

  test("q150 transition matrix equals a driver-side sequence recompute") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val trans = evs.groupBy(_._1).values.flatMap { seq =>
      val ordered = seq.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }.toSeq
    val counts = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expected = counts.map { case ((p, nx), n) =>
      (p, nx) -> (n, 1000L * n / totals(p))
    }

    val got = byName("q150_markov_transitions").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, "transitions diverge from brute force")
    // permilles per source state sum to ~1000 (floor-division slack < |types|)
    got.groupBy(_._1._1).foreach { case (p, m) =>
      val s = m.values.map(_._2).sum
      assert(s > 1000 - m.size && s <= 1000, s"permille sum $s for $p")
    }
  }

  test("q157 Gini equals the brute-force rank formulation on sorted cents") {
    val cents = Tables.events(spark, sfDir)
      .select(col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).map(_._1)
    val n = cents.length.toLong
    val sx = cents.sum
    val sxr = cents.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(1000) * (2 * sxr - BigInt(n + 1) * sx)) / (BigInt(n) * sx)

    val r = byName("q157_gini_concentration").run(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == n && r(0).getLong(1) == sx)
    assert(r(0).getLong(2) == gini.toLong, s"gini ${r(0).getLong(2)} vs $gini")
    // uniform [0, max] spend has Gini ~ 1/3 — sanity that the number is
    // in a plausible band, not merely self-consistent
    assert(r(0).getLong(2) > 150 && r(0).getLong(2) < 500)
  }

  test("q159 trigram paths equal a brute-force sequence recompute") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trigrams = evs.groupBy(_._1).toSeq.flatMap { case (u, seq) =>
      val ordered = seq.sortBy(e => (e._2, e._3)).map(_._4)
      ordered.sliding(3).filter(_.length == 3)
        .map(w => w.mkString(">") -> u).toSeq
    }
    val expected = trigrams.groupBy(_._1).view.mapValues { occ =>
      (occ.size.toLong, occ.map(_._2).distinct.size.toLong)
    }.toMap.toSeq
      .sortBy { case (p, (_, users)) => (-users, p) }.take(20)

    val got = byName("q159_path_trigrams").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toSeq
    assert(got == expected, "trigram mining diverges from brute force")
  }

  test("q162 trend sums and slopes equal a brute-force least-squares recompute") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = evs.map(_._2).min
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val pts = es.map(e => ((e._2 - t0) / 86400000000L, e._3))
      val n = pts.size.toLong
      val st = pts.map(_._1).sum; val sx = pts.map(_._2).sum
      val stx = pts.map(p => p._1 * p._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val num = n * stx - st * sx; val den = n * stt - st * st
      val slope =
        if (den == 0) 0L
        else if (num >= 0) 1000000L * num / den
        else -(1000000L * -num / den)
      u -> ((n, num, den, slope))
    }
    val got = byName("q162_spend_trend").run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, "trend regression diverges from brute force")
    // both slope signs appear, so the sign-symmetric division is exercised
    assert(got.values.exists(_._4 > 0) && got.values.exists(_._4 < 0),
      "fixture should produce both rising and falling trends")
  }

  test("q166 TWAP equals a brute-force step-function integral per user") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).toVector
      val span = sorted.last._2 - sorted.head._2
      val integral = sorted.indices.dropRight(1)
        .map(i => sorted(i)._4 * (sorted(i + 1)._2 - sorted(i)._2)).sum
      val twap =
        if (span == 0) 0L
        else 1000L * (integral / span) + (integral % span) * 1000L / span
      u -> ((sorted.size.toLong, span, integral, twap))
    }
    val got = byName("q166_time_weighted_value").run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, "TWAP diverges from brute-force integral")
    assert(got.values.exists(_._4 > 0), "fixture should have nonzero TWAPs")
  }

  test("q167 attribution conserves sessions and purchase revenue") {
    val rows = byName("q167_first_touch_attribution").run(spark, sfDir).collect()
    val entryStats = byName("q164_session_entry_stats").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every session has exactly one entry type: the two session reports
    // must agree on per-entry-type session counts
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == entryStats,
      "q167/q164 disagree on session counts per entry type")
    // total attributed revenue == total purchase revenue in the data
    val totalPurchase = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalPurchase,
      "attribution drops or double-counts purchase revenue")
    // conversion_permille is the floor-divided ratio of its own columns
    rows.foreach { r =>
      assert(r.getLong(4) == 1000L * r.getLong(2) / r.getLong(1))
    }
  }

  test("q170 winsorized stats equal a sorted-order-statistics recompute") {
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val expected = byType.map { case (ty, cs) =>
      val n = cs.size.toLong
      val lo = cs(((5 * n + 99) / 100 - 1).toInt)   // 1-based rank → index
      val hi = cs(((95 * n + 99) / 100 - 1).toInt)
      val win = cs.map(c => math.max(lo, math.min(hi, c))).sum
      ty -> ((n, lo, hi, 1000L * cs.sum / n, 1000L * win / n))
    }
    val got = byName("q170_winsorized_value").run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "winsorized stats diverge from sorted recompute")
    // clamping actually moves the mean somewhere, or the fixture is degenerate
    assert(got.values.exists(v => v._4 != v._5),
      "fixture should have outliers the clamp removes")
  }

  test("q172 cadence equals a brute-force hour histogram per user") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1) % 86400000000L / 3600000000L))
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val hist = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = es.size.toLong
      val (peakHour, peakCnt) = hist.toSeq.sortBy { case (h, c) => (-c, h) }.head
      u -> ((n, hist.size.toLong, peakHour, 1000L * peakCnt / n))
    }
    val got = byName("q172_hourly_cadence").run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected, "cadence diverges from brute force")
  }

  test("q173 lag histogram conserves signup users and matches brute force") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = evs.filter(_._2 == "signup").groupBy(_._1).map { case (u, ss) =>
      val tS = ss.map(_._3).min
      val ps = evs.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= tS)
      if (ps.isEmpty) -1L else (ps.map(_._3).min - tS) / 86400000000L
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = byName("q173_conversion_lag").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "lag histogram diverges from brute force")
    // conservation: every user with a signup lands in exactly one bucket
    assert(got.values.sum == evs.filter(_._2 == "signup").map(_._1).distinct.size)
  }

  test("q174 SCD2 versions tile each user's history with one open version") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) DIV 5000").as("tier"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).toVector
      val changes = sorted.head +: sorted.sliding(2).collect {
        case Vector(a, b) if a._4 != b._4 => b }.toVector
      changes.zipWithIndex.map { case (c, i) =>
        val to = if (i + 1 < changes.size) Some(changes(i + 1)._2) else None
        (u, i + 1L, c._4, c._2, to)
      }
    }.toSet
    val got = byName("q174_scd2_dimension").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got == expected, "SCD2 versions diverge from brute force")
    // structural invariants: one open version per user; intervals chain
    val byUser = got.groupBy(_._1)
    byUser.foreach { case (u, vs) =>
      assert(vs.count(_._5.isEmpty) == 1, s"user $u open versions")
      val sorted = vs.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"user $u: version chain broken")
          assert(a._3 != b._3, s"user $u: adjacent versions share a tier")
        case _ => ()
      }
    }
  }

  test("q177 drop-off conserves users and rolls up q112's depths exactly") {
    val depths = byName("q112_funnel").run(spark, sfDir).collect()
      .map(r => r.getInt(2).toLong)
    val rows = byName("q177_funnel_dropoff").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    assert(rows.values.map(_._1).sum == depths.length, "users not conserved")
    (0L to 3L).foreach { d =>
      assert(rows(d)._1 == depths.count(_ == d), s"n_at depth $d")
      assert(rows(d)._2 == depths.count(_ >= d), s"n_reached depth $d")
    }
    // conversion permille recomputes from the reached counts
    (1L to 3L).foreach { d =>
      val prev = rows(d - 1)._2
      val expect = if (prev == 0) 0L else 1000L * rows(d)._2 / prev
      assert(rows(d)._3 == expect, s"conversion at depth $d")
    }
    assert(rows(0L)._3 == 1000L)
  }

  test("q178 median/MAD equal sorted-order-statistics per event type") {
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val expected = byType.map { case (ty, cs) =>
      val n = cs.size.toLong
      val med = cs(((n + 1) / 2 - 1).toInt)
      val devs = cs.map(c => math.abs(c - med)).sorted
      ty -> ((n, med, devs(((n + 1) / 2 - 1).toInt)))
    }
    val got = byName("q178_value_mad").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, "median/MAD diverge from sorted order statistics")
    assert(got.values.forall(_._3 > 0), "MAD should be positive on this data")
  }

  test("q179 lift equals a brute-force session co-occurrence recompute") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // sessionize per user with the >2h gap rule, collect type sets
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).toVector
      sorted.tail.foldLeft(Vector(Vector(sorted.head))) { (acc, e) =>
        if (e._2 - acc.last.last._2 > 7200000000L) acc :+ Vector(e)
        else acc.init :+ (acc.last :+ e)
      }.map(_.map(_._4).toSet)
    }
    val nS = BigInt(sessions.size)
    val typeN = sessions.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = sessions.flatMap(s =>
      s.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) })
      .groupBy(identity).map { case ((a, b), xs) =>
        val nab = xs.size.toLong
        (a, b) -> ((nab, typeN(a), typeN(b),
          (BigInt(nab) * nS * 1000000 / (BigInt(typeN(a)) * typeN(b))).toLong))
      }
    val got = byName("q179_session_lift").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "session lift diverges from brute force")
  }

  test("q186 interpolation equals a brute-force segment recompute") {
    val obs = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("h"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = obs.groupBy(_._1).flatMap { case (ty, pts) =>
      val sorted = pts.map(p => (p._2, p._3)).sortBy(_._1).toVector
      val observed = sorted.map { case (h, c) => (ty, h, 1000L * c, 0L) }
      val interp = sorted.sliding(2).flatMap {
        case Vector((h1, c1), (h2, c2)) if h2 > h1 + 1 =>
          (h1 + 1 until h2).map { h =>
            val num = 1000L * (c2 - c1) * (h - h1)
            val base = 1000L * c1 + (if (num >= 0) num / (h2 - h1)
              else -((-num) / (h2 - h1)))
            (ty, h, base, 1L)
          }
        case _ => Seq.empty
      }
      observed ++ interp
    }.toSet
    val got = byName("q186_interpolate_gaps").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "interpolation diverges from brute force")
    assert(got.exists(_._4 == 1L), "fixture should contain gaps to fill")
  }

  test("q188 Benford audit: digits conserve values and flag the uniform fixture") {
    val rows = byName("q188_benford_audit").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == (1L to 9L).toSet)
    val nPositive = Tables.events(spark, sfDir)
      .filter((col("value").cast("decimal(18,2)") * 100).cast("long") > 0).count()
    assert(rows.values.map(_._1).sum == nPositive, "values not conserved")
    // brute-force the first digit
    val digits = Tables.events(spark, sfDir)
      .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().map(_.getLong(0)).filter(_ > 0)
      .map { v => var x = v; while (x >= 10) x /= 10; x }
    (1L to 9L).foreach { d =>
      assert(rows(d)._1 == digits.count(_ == d), s"digit $d count")
      assert(rows(d)._2 == 1000L * rows(d)._1 / digits.length, s"digit $d permille")
      val dev = rows(d)._2 - rows(d)._3
      assert(rows(d)._4 == dev * dev, s"digit $d dev2")
    }
    // uniform cents are NOT Benford: the audit must show real deviation
    assert(rows.values.map(_._4).max > 100, "uniform fixture should fail Benford")
  }

  test("q189 Simpson diversity equals a BigInt recompute with correct bounds") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val cs = es.groupBy(_._2).map(_._2.size.toLong)
      val n = BigInt(cs.sum)
      u -> ((cs.sum, cs.size.toLong,
        ((BigInt(1000000) * (n * n - cs.map(c => BigInt(c) * c).sum)) / (n * n)).toLong))
    }
    val got = byName("q189_behavior_diversity").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, "Simpson index diverges from BigInt recompute")
    // bounds: 0 <= simpson < 1e6, and a k-type user is capped at (k-1)/k
    got.values.foreach { case (_, k, sp) =>
      assert(sp >= 0 && sp < 1000000)
      assert(sp <= 1000000L * (k - 1) / k + 1, "above the uniform cap")
    }
  }

  test("q191 regression determinants equal a BigInt Cramer recompute") {
    val evs = Tables.events(spark, sfDir)
      .select(unix_micros(col("ts")).as("t"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val t0 = evs.map(_._1).min
    val pts = evs.map { case (us, y) =>
      ((us - t0) / 86400000000L, us % 86400000000L / 3600000000L, y) }
    def S(f: ((Long, Long, Long)) => BigInt) = pts.map(f).sum
    val (n, st, sh) = (BigInt(pts.size), S(p => BigInt(p._1)), S(p => BigInt(p._2)))
    val stt = S(p => BigInt(p._1) * p._1); val sth = S(p => BigInt(p._1) * p._2)
    val shh = S(p => BigInt(p._2) * p._2); val sy = S(p => BigInt(p._3))
    val sty = S(p => BigInt(p._1) * p._3); val shy = S(p => BigInt(p._2) * p._3)
    val den = n * (stt * shh - sth * sth) - st * (st * shh - sth * sh) +
      sh * (st * sth - stt * sh)
    val d0 = sy * (stt * shh - sth * sth) - st * (sty * shh - sth * shy) +
      sh * (sty * sth - stt * shy)
    val d1 = n * (sty * shh - shy * sth) - sy * (st * shh - sh * sth) +
      sh * (st * shy - sh * sty)
    val d2 = n * (stt * shy - sth * sty) - st * (st * shy - sh * sty) +
      sy * (st * sth - sh * stt)
    def milli(d: BigInt) =
      if (den == 0) 0L
      else if (d >= 0) (BigInt(1000) * d / den).toLong
      else -(BigInt(1000) * -d / den).toLong
    val r = byName("q191_linear_regression").run(spark, sfDir).collect()(0)
    assert(r.getLong(0) == n.toLong)
    assert(r.getString(1) == den.toString && r.getString(2) == d0.toString)
    assert(r.getString(3) == d1.toString && r.getString(4) == d2.toString)
    assert(r.getLong(5) == milli(d0) && r.getLong(6) == milli(d1) &&
      r.getLong(7) == milli(d2))
    // residual optimality check: the normal equations actually hold for
    // the exact rational solution — verify M * beta == v in exact
    // arithmetic (beta_i = d_i / den, cleared by den)
    assert(n * d0 + st * d1 + sh * d2 == sy * den, "normal eq 0")
    assert(st * d0 + stt * d1 + sth * d2 == sty * den, "normal eq 1")
    assert(sh * d0 + sth * d1 + shh * d2 == shy * den, "normal eq 2")
  }

  test("q194 Lorenz curve is monotone, diagonal-bounded, and brute-force exact") {
    val rows = byName("q194_lorenz_curve").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L).toSeq)
    // brute force from per-user totals
    val cents = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ranked = cents.sortBy { case (u, c) => (c, u) }.zipWithIndex
    val n = ranked.length
    val byDec = ranked.groupBy { case (_, i) => i.toLong * 10 / n }
    val total = cents.map(_._2).sum
    rows.foreach { case (d, nu, dc, cup, csp) =>
      val mine = byDec(d)
      assert(nu == mine.length.toLong && dc == mine.map(_._1._2).sum, s"decile $d")
      val cumU = (0L to d).map(byDec(_).length.toLong).sum
      val cumC = (0L to d).map(byDec(_).map(_._1._2).sum).sum
      assert(cup == 1000L * cumU / n && csp == 1000L * cumC / total, s"cum $d")
      assert(csp <= cup, "Lorenz curve must sit on or below the diagonal")
    }
    assert(rows.last._4 == 1000L && rows.last._5 == 1000L)
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.toSeq,
      "cumulative share not monotone")
  }

  test("q195 JSON profiles parse back to the exact histograms") {
    val got = byName("q195_user_profile_json").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hists = evs.groupBy(_._1).view
      .mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    assert(got.map(_._1).toSet == hists.keySet)
    got.foreach { case (u, n, json) =>
      assert(n == hists(u).values.sum, s"user $u count")
      val expected = "{" + hists(u).toSeq.sorted
        .map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}"
      assert(json == expected, s"user $u profile: $json vs $expected")
    }
  }

  test("q199 churn equals a brute-force hour-set recompute") {
    val hu = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) DIV 3600000000").as("h"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byH = hu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = byH.keys.toSeq.sorted.flatMap { h =>
      byH.get(h + 1).map { next =>
        val cur = byH(h); val ret = (cur & next).size.toLong
        (h, (cur.size.toLong, next.size.toLong, ret,
          next.size - ret, cur.size - ret,
          1000L * ret / (cur.size + next.size - ret)))
      }
    }.toMap
    val got = byName("q199_audience_churn").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected, "churn diverges from brute-force hour sets")
    assert(got.nonEmpty)
  }

  test("q200 datasheet rolls up q168/q23/q26 signals consistently") {
    val ds = byName("q200_source_datasheet").run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(ds.values.map(_._1).sum == docs.length, "docs conserved")
    // novelty column == q168's per-doc novelty aggregated per source
    val srcOf = docs.map { case (s0, d) => d -> s0 }.toMap
    val nov = byName("q168_shingle_novelty").run(spark, sfDir).collect()
      .map(r => (srcOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val novBySrc = nov.groupBy(_._1).view
      .mapValues(xs => 1000L * xs.map(_._3).sum / xs.map(_._2).sum).toMap
    // sources whose every doc has >= 8 tokens appear in both with equal
    // ratios (q168 drops short docs; this fixture has none short)
    novBySrc.foreach { case (s0, np) =>
      assert(ds(s0)._6 == np, s"novelty rollup mismatch for $s0")
    }
    ds.values.foreach { case (_, _, langs, stopPm, dupPm, novPm) =>
      assert(langs >= 1 && stopPm >= 0 && stopPm <= 1000)
      assert(dupPm >= 0 && dupPm <= 1000 && novPm >= 0 && novPm <= 1000)
    }
  }

  test("events analytics queries are registered with oracles") {
    Seq("q148_active_streaks", "q149_rolling_anomaly",
      "q150_markov_transitions", "q157_gini_concentration",
      "q159_path_trigrams", "q162_spend_trend",
      "q164_session_entry_stats", "q166_time_weighted_value",
      "q167_first_touch_attribution", "q170_winsorized_value",
      "q172_hourly_cadence", "q173_conversion_lag",
      "q174_scd2_dimension", "q177_funnel_dropoff", "q178_value_mad",
      "q179_session_lift", "q186_interpolate_gaps", "q188_benford_audit",
      "q189_behavior_diversity", "q191_linear_regression",
      "q194_lorenz_curve", "q195_user_profile_json", "q199_audience_churn",
      "q200_source_datasheet").foreach { n =>
      assert(SparkEntry.queries.contains(n), n)
      assert(SparkEntry.oracleSql.contains(n), n)
    }
  }

  test("q225 EWMA control chart equals a zero-filled Scala recompute") {
    val counts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.keys.map(_._1).toSeq.distinct.flatMap { et =>
      val hs = counts.collect { case ((t, h), _) if t == et => h }
      val series = (hs.min to hs.max)
        .map(h => h -> counts.getOrElse((et, h), 0L))
      series.indices.drop(16).map { i =>
        val (h, cnt) = series(i)
        val base = (1 to 16).map(k => (1L << (16 - k)) * series(i - k)._2).sum
        (et, h, cnt, base, 1000L * base / 65535L,
          if (cnt * 65535L > 2L * base) 1 else 0)
      }
    }.toSet
    val rows = byName("q225_ewma_control").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet
    assert(rows == expected,
      "EWMA baseline diverges from the zero-filled Scala recompute")
    // decay sanity: a baseline is bounded by 65535 × the max lagged count
    expected.foreach { case (_, _, _, base, _, _) =>
      assert(base >= 0, "dyadic weights over non-negative counts")
    }
  }

  test("q227 CUSUM closed form equals the textbook max(0, ...) recurrence") {
    // the recompute runs Page's ORIGINAL recurrence — not the
    // prefix-minus-running-min closed form the query uses — so the
    // closed-form rewrite itself is what this test proves
    val counts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = counts.keys.map(_._1).toSeq.distinct.flatMap { et =>
      val hs = counts.collect { case ((t, h), _) if t == et => h }
      val series = (hs.min to hs.max)
        .map(h => h -> counts.getOrElse((et, h), 0L))
      val mu = 1000L * series.map(_._2).sum / series.size
      val k = mu / 4
      var s = 0L
      series.map { case (h, cnt) =>
        s = math.max(0L, s + 1000L * cnt - mu - k)
        (et, h, cnt, s, 8L * mu, if (s > 8L * mu) 1 else 0)
      }
    }.toSet
    val rows = byName("q227_cusum_changepoint").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet
    assert(rows == expected,
      "closed-form CUSUM diverges from the textbook recurrence")
  }

  test("q228 Theil-Sen equals a Scala pair-median recompute and resists an outlier") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def theilSen(series: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val s = series.sortBy(_._1)
      val slopes = (for {
        i <- s.indices; j <- i + 1 until s.size
      } yield (1000L * (s(j)._2 - s(i)._2)) / (s(j)._1 - s(i)._1)).sorted
      val slope = slopes((slopes.size + 1) / 2 - 1)
      val resid = s.map { case (d, c) => 1000L * c - slope * d }.sorted
      (s.size.toLong, slopes.size.toLong, slope, resid((resid.size + 1) / 2 - 1))
    }
    val expected = daily.keys.map(_._1).toSeq.distinct.map { et =>
      val series = daily.collect { case ((t, d), c) if t == et => (d, c) }.toSeq
      val (nd, np, sl, ic) = theilSen(series)
      (et, nd, np, sl, ic)
    }.toSet
    val rows = byName("q228_theil_sen").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(rows == expected, "Theil-Sen diverges from the Scala pair median")
    // robustness: corrupting ONE day by 100x moves the pair median by
    // less than the corruption would move a mean-based slope
    val series = daily.collect { case ((t, d), c) if t == expected.head._1 => (d, c) }.toSeq
    val (_, _, clean, _) = theilSen(series)
    val corrupted = series.updated(series.size / 2,
      (series(series.size / 2)._1, series(series.size / 2)._2 * 100))
    val (_, _, dirty, _) = theilSen(corrupted)
    assert(math.abs(dirty - clean) < 100L * 1000L,
      "pair median must absorb a single 100x outlier day")
  }

  test("q229 Mann-Kendall equals a Scala recompute; synthetic trends decide correctly") {
    def mk(series: Seq[(Long, Long)]): (Long, Long, Long, Int) = {
      val s = series.sortBy(_._1)
      val n = s.size.toLong
      val sStat = (for {
        i <- s.indices; j <- i + 1 until s.size
      } yield java.lang.Long.signum(s(j)._2 - s(i)._2).toLong).sum
      val tie = s.groupBy(_._2).values.map(_.size.toLong).filter(_ >= 2)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie
      val sig =
        if (math.abs(sStat) > 0 &&
          (math.abs(sStat) - 1) * (math.abs(sStat) - 1) * 625 * 18 > var18 * 2401) 1
        else 0
      (n, sStat, var18, sig)
    }
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 86400000000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = daily.keys.map(_._1).toSeq.distinct.map { et =>
      val series = daily.collect { case ((t, d), c) if t == et => (d, c) }.toSeq
      val (n, sStat, var18, sig) = mk(series)
      (et, n, sStat, var18, sig)
    }.toSet
    val rows = byName("q229_mann_kendall").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(rows == expected, "Mann-Kendall diverges from the Scala recompute")
    // decision sanity on synthetic series: a strict 30-day ramp is
    // significant, a constant series is not (S = 0 short-circuits)
    val ramp = (1L to 30L).map(d => (d, d))
    assert(mk(ramp)._4 == 1, "a strict monotone ramp must flag")
    val const = (1L to 30L).map(d => (d, 7L))
    assert(mk(const)._2 == 0L && mk(const)._4 == 0, "a constant series must not flag")
  }

  test("q235 Nelson-Aalen hazard equals a Scala recompute with censoring") {
    val spans = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(ds => (ds.map(_._2).min, ds.map(_._2).max))
      .toMap
    val horizon = spans.values.map(_._2).max
    val lt = spans.values.toSeq.map { case (d0, d1) =>
      (d1 - d0, if (d1 < horizon) 1L else 0L)
    }
    val ts = lt.map(_._1).distinct.sorted
    val byT = lt.groupBy(_._1)
    val haz = ts.map { t =>
      val d = byT(t).map(_._2).sum
      val c = byT(t).size - d
      val nRisk = lt.count(_._1 >= t).toLong
      (t, nRisk, d, c, 1000000L * d / nRisk)
    }
    val expected = haz.map { case (t, n, d, c, h) =>
      (t, n, d, c, h, haz.filter(_._1 <= t).map(_._5).sum)
    }.toSet
    val rows = byName("q235_survival_hazard").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows == expected, "hazard diverges from the Scala recompute")
    // structural gates: risk sets shrink as lifetime grows, the
    // cumulative hazard is monotone, every user exits exactly once,
    // and the horizon lifetime is fully censored (nobody can churn AT
    // the horizon — censoring is the point of the estimator)
    val byLife = rows.toSeq.sortBy(_._1)
    assert(byLife.map(_._2) == byLife.map(_._2).sorted.reverse, "risk sets must shrink")
    assert(byLife.map(_._6) == byLife.map(_._6).sorted, "cumulative hazard must be monotone")
    assert(rows.map(r => r._3 + r._4).sum == spans.size.toLong, "every user exits once")
    assert(rows.map(_._4).sum == spans.values.count(_._2 == horizon).toLong,
      "censored exits must be exactly the horizon-day users")
  }

  /** Zero-filled hourly series per type — shared by the q238/q239
    * recomputes (the q225/q227 spine in plain Scala). */
  private lazy val hourlySeries: Map[String, IndexedSeq[(Long, Long)]] = {
    val counts = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    counts.keys.map(_._1).toSeq.distinct.map { et =>
      val hs = counts.collect { case ((t, h), _) if t == et => h }
      et -> (hs.min to hs.max).map(h => h -> counts.getOrElse((et, h), 0L))
    }.toMap
  }

  test("q238 autocorrelation equals the n-scaled Scala recompute at both lags") {
    val expected = hourlySeries.flatMap { case (et, series) =>
      val n = series.size.toLong
      val s = series.map(_._2).sum
      val d = series.map { case (_, c) => n * c - s }
      val den = d.map(x => x * x).sum
      Seq(1, 24).map { k =>
        val num = (k until d.size).map(i => d(i) * d(i - k)).sum
        (et, n, k.toLong, num, den, 1000L * num / den)
      }
    }.toSet
    val rows = byName("q238_autocorrelation").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows == expected, "ACF diverges from the Scala recompute")
    // |r_k| <= 1 on exact integers (Cauchy-Schwarz over the lagged slice)
    rows.foreach { case (_, _, _, _, den, acf) =>
      assert(den > 0 && acf >= -1000 && acf <= 1000)
    }
  }

  test("q239 changepoint location equals the Scala argmax recompute") {
    val expected = hourlySeries.map { case (et, series) =>
      val n = series.size.toLong
      val s = series.map(_._2).sum
      var dd = 0L
      var px = 0L
      val prefixes = series.zipWithIndex.dropRight(1).map { case ((h, c), i) =>
        dd += n * c - s; px += c
        (math.abs(dd), -h, h, px, i + 1L)
      }
      val win = prefixes.max
      (et, win._3, n, win._1, 1000L * win._4 / win._5,
        1000L * (s - win._4) / (n - win._5))
    }.toSet
    val rows = byName("q239_changepoint_location").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows == expected, "changepoint diverges from the Scala argmax")
    // the split must actually split: 1 <= t < n is enforced by the
    // last-row exclusion, so both means exist and differ from each
    // other unless the series is constant
    rows.foreach { case (_, cp, n, peak, _, _) =>
      assert(peak >= 0 && n >= 2, s"degenerate split at $cp")
    }
  }

  test("q240 seasonal profile equals a zero-filled Scala recompute per clock hour") {
    val expected = hourlySeries.flatMap { case (et, series) =>
      series.groupBy(_._1 % 24).map { case (hod, obs) =>
        val cs = obs.map(_._2).sorted
        val n = cs.size.toLong
        (et, hod, n, cs.head, cs(((n + 1) / 2 - 1).toInt), cs.last,
          1000L * cs.sum / n)
      }
    }.toSet
    val rows = byName("q240_seasonal_profile").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(rows == expected, "seasonal profile diverges from the Scala recompute")
    // order statistics must order: min <= median <= max per row
    rows.foreach { case (_, _, _, mn, md, mx, _) =>
      assert(mn <= md && md <= mx)
    }
  }

  test("q242 Hampel outliers equal a Scala median/MAD recompute") {
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply(((xs.size + 1) / 2) - 1)
    val expected = hourlySeries.flatMap { case (et, series) =>
      val med = lowerMedian(series.map(_._2))
      val mad = lowerMedian(series.map { case (_, c) => math.abs(c - med) })
      series.collect {
        case (h, c) if math.abs(c - med) > 3 * mad =>
          (et, h, c, med, mad, math.abs(c - med) - 3 * mad)
      }
    }.toSet
    val rows = byName("q242_hampel_outliers").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(rows == expected, "Hampel flags diverge from the Scala recompute")
    rows.foreach { case (_, _, _, _, _, excess) => assert(excess > 0) }
  }

  test("q243 Tukey fences equal a Scala quartile recompute") {
    val expected = hourlySeries.flatMap { case (et, series) =>
      val s = series.map(_._2).sorted
      val n = s.size
      val q1 = s(math.max((n + 1) / 4, 1) - 1)
      val q3 = s((3 * (n + 1)) / 4 - 1)
      val iqr = q3 - q1
      series.collect {
        case (h, c) if 2 * c > 2 * q3 + 3 * iqr || 2 * c < 2 * q1 - 3 * iqr =>
          (et, h, c, q1, q3, 1,
            if (c > q3 + 3 * iqr || c < q1 - 3 * iqr) 1 else 0)
      }
    }.toSet
    val rows = byName("q243_tukey_fences").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6))).toSet
    assert(rows == expected, "Tukey flags diverge from the Scala recompute")
    // far-out rows are a subset of outside rows by construction
    rows.foreach { case (_, _, _, q1, q3, outside, far) =>
      assert(outside == 1 && (far == 0 || far == 1) && q1 <= q3)
    }
  }

  test("q244 rank concordance equals a Scala pair-count recompute") {
    val byHour = hourlySeries.view.mapValues(_.toMap).toMap
    val types = hourlySeries.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
    } yield {
      val shared = (byHour(a).keySet & byHour(b).keySet).toSeq.sorted
      val xs = shared.map(h => (byHour(a)(h), byHour(b)(h)))
      var cc = 0L; var dd = 0L; var np = 0L
      for (i <- xs.indices; k <- i + 1 until xs.size) {
        np += 1
        val s = (xs(k)._1 - xs(i)._1) * (xs(k)._2 - xs(i)._2)
        if (s > 0) cc += 1 else if (s < 0) dd += 1
      }
      (a, b, np, cc, dd, 1000L * (cc - dd) / math.max(cc + dd, 1L),
        1000L * (cc - dd) / np)
    }).toSet
    val rows = byName("q244_rank_concordance").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(rows == expected, "concordance diverges from the Scala recompute")
    // |gamma| and |tau_a| are correlation-bounded, and tau never
    // exceeds gamma in magnitude (same numerator, larger denominator)
    rows.foreach { case (_, _, _, _, _, g, t) =>
      assert(g >= -1000 && g <= 1000 && t >= -1000 && t <= 1000)
      assert(math.abs(t) <= math.abs(g) + 1, "tie mass can only shrink the ratio")
    }
  }
}
