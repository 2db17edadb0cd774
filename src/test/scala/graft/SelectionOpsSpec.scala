package graft

import org.apache.spark.sql.functions._

/** Specs for the data-selection tier additions q206+: each test
  * recomputes the operator's published rule from the raw table with
  * plain Scala collections and compares exactly — independent of both
  * the Spark plan and the DuckDB oracle, so a shared misreading of the
  * paper's rule can't pass by agreement.
  */
class SelectionOpsSpec extends SparkSpec {

  private val sfDir = TestSession.sfDir
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  /** Per-doc rule measures recomputed in Scala (q206's battery). */
  private def gopherMeasures(text: String): (Long, Long, Long, Long, Long) = {
    val w = text.split(" ", -1)
    val nw = w.length.toLong
    val sumlen = w.map(_.length.toLong).sum
    val nshort = w.count(_.length <= 2).toLong
    val stop = Set("the", "a", "of", "and", "to")
    val nstopd = w.filter(stop).distinct.length.toLong
    val ntop = w.groupBy(identity).values.map(_.length).max.toLong
    (nw, sumlen, nshort, nstopd, ntop)
  }

  test("q206 per-source rule attribution equals a Scala recompute of the battery") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val fails = rows.map { case (_, text) =>
        val (nw, sumlen, nshort, nstopd, ntop) = gopherMeasures(text)
        (if (nw < 30 || nw > 90) 1L else 0L,
          if (sumlen * 1000 < 3500 * nw || sumlen * 1000 > 4800 * nw) 1L else 0L,
          if (nshort * 1000 > 120 * nw) 1L else 0L,
          if (nstopd < 2) 1L else 0L,
          if (ntop * 1000 > 120 * nw) 1L else 0L)
      }
      val n = rows.size.toLong
      val fw = fails.map(_._1).sum; val fl = fails.map(_._2).sum
      val fs = fails.map(_._3).sum; val ft = fails.map(_._4).sum
      val fr = fails.map(_._5).sum
      val pass = fails.count(f => f._1 + f._2 + f._3 + f._4 + f._5 == 0).toLong
      src -> ((n, fw, fl, fs, ft, fr, pass, 1000L * pass / n))
    }
    val got = byName("q206_gopher_rules").run(spark, sfDir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    }.toMap
    assert(got == expected)
    // the battery is non-trivial on this corpus: some rule fires AND some doc passes
    assert(got.values.map(_._7).sum > 0, "no doc passes — thresholds miscalibrated")
    assert(got.values.exists(v => v._1 > v._7), "no doc fails — thresholds vacuous")
  }

  /** The PUBLISHED UniMax procedure: visit languages smallest-first,
    * give each min(cap, remaining/remaining_langs), tracked in exact
    * BigInt rationals (remaining = num/den). The query implements the
    * closed-form waterline; this sequential loop is the independent
    * derivation the paper actually states.
    */
  private def unimaxGreedy(caps: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    var num = BigInt(budget) * 1000; var den = BigInt(1)
    var k = caps.size
    val alloc = scala.collection.mutable.Map[String, Long]()
    for ((lang, cap) <- caps.sortBy(c => (c._2, c._1))) {
      val capMilli = BigInt(cap) * 1000
      if (capMilli * den * k <= num) { // cap <= remaining/k: saturate
        alloc(lang) = cap * 1000
        num = num - capMilli * den; // remaining -= cap
      } else {
        alloc(lang) = (num / (den * k)).toLong // floor of the waterline
        num = num * (k - 1); den = den * k // remaining -= remaining/k
      }
      k -= 1
    }
    alloc.toMap
  }

  test("q207 closed-form waterfilling equals the sequential UniMax greedy (both regimes)") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val rows = byName("q207_unimax_allocation").run(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      val caps = rows.map(r => r._1 -> r._3).toSeq
      val budget = rows.map(_._2).sum * 2
      val expected = unimaxGreedy(caps, budget)
      rows.foreach { case (lang, nDocs, cap, sat, alloc, epochsMilli) =>
        assert(cap == 3 * nDocs)
        assert(alloc == expected(lang), s"$dir $lang: $alloc vs ${expected(lang)}")
        assert(sat == (if (alloc == 1000 * cap) 1L else 0L))
        assert(epochsMilli == alloc / nDocs)
        assert(alloc <= 3000 * nDocs, "epoch cap violated")
      }
      // never over budget; floor loses < 1 millidoc per language
      val total = rows.map(_._5).sum
      assert(total <= 1000 * budget && total > 1000 * budget - rows.length - 1000,
        s"$dir: allocated $total of ${1000 * budget}")
    }
    // the two fixtures cover both regimes: sf0.01 saturates its smallest
    // language, sf0.001 leaves all five under the waterline
    val mixed = byName("q207_unimax_allocation").run(spark, "/root/testdata/sf0.01")
      .collect().map(_.getLong(3)).sum
    assert(mixed > 0, "sf0.01 should saturate at least one language")
  }

  test("q208 boilerplate removal equals a Scala recompute of the census rule") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def chunksOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
    val census = docs.flatMap { case (id, t) => chunksOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size }
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.map { case (id, t) =>
      val cs = chunksOf(t)
      val boiler = cs.map(c => census(c) >= 3)
      val clean = cs.zip(boiler).collect { case (c, false) => c }.mkString(" ")
      id -> ((cs.size.toLong, boiler.count(identity).toLong,
        1000L * boiler.count(identity) / cs.size, md5hex(clean)))
    }.toMap
    val got = byName("q208_boilerplate_chunks").run(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
    assert(got == expected)
    assert(got.values.map(_._2).sum > 0, "no boilerplate found — rule vacuous here")
    assert(got.values.exists(v => v._2 == 0), "everything boilerplate — rule broken")
  }

  /** Fixed-point quantization shared with the engine: round half-up to
    * 4 decimals, scaled to integer ten-thousandths. */
  private def fixedPoint(v: Seq[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .*(BigDecimal(10000)).toLongExact).toArray

  test("q209 picks equal a brute-force greedy farthest-point traversal") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> fixedPoint(r.getSeq[Float](1)))
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val seed = vecs.minBy(_._1)
    var sel = Vector((1L, seed._1, 0L))
    var centers = Vector(seed._2)
    for (r <- 2 to 8) {
      val chosen = sel.map(_._2).toSet
      val (id, d) = vecs.filterNot(v => chosen(v._1))
        .map { case (id, v) => (id, centers.map(c => sq(v, c)).min) }
        .minBy { case (id, d) => (-d, id) } // max distance, ties to low id
      sel :+= ((r.toLong, id, d))
      centers :+= vecs.find(_._1 == id).get._2
    }
    val got = byName("q209_kcenter_coreset").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toVector
    assert(got == sel)
    // greedy invariant: the coverage distance never increases
    got.map(_._3).drop(1).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "farthest-point distances must be non-increasing")
      case _         =>
    }
  }

  test("q211 temperature weights equal the alpha=1/2 formula and flatten the head") {
    val rows = byName("q211_temperature_mixture").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = rows.map(_._2).sum
    val ssum = rows.map(_._3).sum
    rows.foreach { case (lang, n, s, w, a) =>
      assert(s == math.floor(math.sqrt(n.toDouble * 1000000)).toLong,
        s"$lang milli-sqrt mismatch")
      assert(w == 1000L * s / ssum && a == 1000L * total * s / ssum)
    }
    // temperature flattens: the biggest language's weight share drops
    // below its raw share, the smallest language's rises above it
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    assert(1000L * big._3 / ssum < 1000L * big._2 / total + 1,
      "head language must be down-weighted")
    assert(1000L * small._3 / ssum > 1000L * small._2 / total,
      "tail language must be up-weighted")
    // and a language never receives more than its own corpus-share
    // boost bound: weights are a permutation-invariant function of n
    assert(rows.sortBy(_._2).map(_._4).toSeq == rows.sortBy(_._2).map(_._4).sorted.toSeq,
      "weights must be monotone in language size")
  }
}
