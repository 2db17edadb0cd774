package graft

import org.apache.spark.sql.functions._

/** Brute-force recomputes of the drift-monitoring tier (q273-q277):
  * every statistic is re-derived in plain Scala from the collected
  * fixture and compared EXACTLY (the same integer arithmetic both
  * engines run), plus partitioning invariance for the grid queries.
  */
class DriftSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  /** The q256 quantized dyadic log2 (micro-bits), test-side copy. */
  private val l2tbl: IndexedSeq[Long] =
    (64 to 127).map(m => math.round(math.log(m / 64.0) / math.log(2.0) * 1e6))
  private def l2q(x: Long): Long = {
    require(x >= 1)
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (bl - 1).toLong * 1000000L + l2tbl((x * 64 / (1L << (bl - 1))).toInt - 64)
  }

  private def lengthsBySource: Map[String, Seq[Long]] =
    Tables.documents(spark, sfDir).select(col("source"), col("n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2).toSeq }

  test("q273 KS and W1 equal a brute-force CDF walk, all pairs") {
    val by = lengthsBySource
    val dom = by.values.flatten.toSeq.distinct.sorted
    def cum(v: Seq[Long]): Map[Long, Long] = {
      var c = 0L
      dom.map { x => c += v.count(_ == x); x -> c }.toMap
    }
    val got = byName("q273_dist_drift").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val pairs = by.keys.toSeq.sorted.combinations(2).toSeq
    assert(got.size == pairs.size, "one row per ordered source pair")
    for (Seq(sa, sb) <- pairs) {
      val (a, b) = (by(sa), by(sb))
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val (ca, cb) = (cum(a), cum(b))
      val dnum = dom.map(v => math.abs(ca(v) * nb - cb(v) * na))
      val ks = 1000L * dnum.max / (na * nb)
      val w1 = 1000L * dom.zip(dom.drop(1)).zip(dnum).map {
        case ((v, nxt), d) => d * (nxt - v)
      }.sum / (na * nb)
      assert(got((sa, sb)) == (na, nb, ks, w1), s"pair $sa/$sb")
    }
  }

  test("q274 u2 equals the O(n*m) comparison count, AUC/rb consistent") {
    val by = lengthsBySource
    val got = byName("q274_mann_whitney").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    for (Seq(sa, sb) <- by.keys.toSeq.sorted.combinations(2)) {
      val (a, b) = (by(sa), by(sb))
      val u2 = a.map(x => b.map(y =>
        if (x > y) 2L else if (x == y) 1L else 0L).sum).sum
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val (gu2, gauc, grb) = got((sa, sb))
      assert(gu2 == u2, s"u2 at $sa/$sb")
      assert(gauc == 500L * u2 / (na * nb) && grb == 1000L * u2 / (na * nb) - 1000L)
    }
    // antisymmetry sanity: u2(a,b) + u2(b,a) = 2*na*nb, so auc in [0,1000]
    got.values.foreach { case (_, auc, rb) =>
      assert(auc >= 0 && auc <= 1000 && rb >= -1000 && rb <= 1000)
    }
  }

  test("q275 fuzzy match census equals a brute-force Levenshtein sweep") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sfDir).select(col("p_name")).collect()
      .map(_.getString(0)).groupBy(identity).map { case (n, a) => n -> a.length.toLong }
    val byNoun = names.groupBy(_._1.split(' ').last)
    val got = byName("q275_fuzzy_name_match").run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == byNoun.keySet)
    for ((noun, ns) <- byNoun) {
      val ds = ns.keys.toSeq.sorted
      val pairs = for {
        i <- ds.indices; j <- (i + 1) until ds.size
        if lev(ds(i), ds(j)) <= 2
      } yield ns(ds(i)) * ns(ds(j))
      val n = ds.size.toLong
      assert(got(noun) == (n, n * (n - 1) / 2, pairs.size.toLong, pairs.sum),
        s"block $noun")
    }
  }

  test("q276 chi2 is the exact bounded-quotient formula; js >= 0 and pinned") {
    val tc = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, a) =>
        s -> a.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
      }
    val vocab = tc.values.flatMap(_.keys).toSet
    val got = byName("q276_vocab_divergence").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(4), r.getLong(5))).toMap
    for (Seq(sa, sb) <- tc.keys.toSeq.sorted.combinations(2)) {
      val (ma, mb) = (tc(sa), tc(sb))
      val (na, nb) = (ma.values.sum, mb.values.sum)
      var chi = BigInt(0); var js = BigInt(0)
      for (t <- vocab) {
        val x = ma.getOrElse(t, 0L) * nb
        val y = mb.getOrElse(t, 0L) * na
        if (x + y > 0)
          chi += (BigInt(1000000) * math.abs(x - y) / (x + y)) * math.abs(x - y)
        if (x > 0) js += BigInt(x) * (l2q(2 * x) - l2q(x + y))
        if (y > 0) js += BigInt(y) * (l2q(2 * y) - l2q(x + y))
      }
      val expChi = (chi / (BigInt(na) * nb)).toLong
      val expJs = (js.max(BigInt(0)) / (BigInt(2) * na * nb)).toLong
      assert(got((sa, sb)) == (expChi, expJs), s"pair $sa/$sb")
      assert(expJs >= 0)
    }
  }

  test("q277 PSI is non-negative and equals the quantized-log recompute") {
    val by = lengthsBySource.map { case (s, v) => s -> v.map(_ / 64) }
    val dom = by.values.flatten.toSeq.distinct
    val nbuck = dom.size.toLong
    val got = byName("q277_psi_drift").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    for (Seq(sa, sb) <- by.keys.toSeq.sorted.combinations(2)) {
      val (a, b) = (by(sa), by(sb))
      val (na, nb) = (a.size.toLong, b.size.toLong)
      var num = BigInt(0)
      for (v <- dom) {
        val x = (a.count(_ == v) + 1L) * (nb + nbuck)
        val y = (b.count(_ == v) + 1L) * (na + nbuck)
        num += BigInt(x - y) * (l2q(x) - l2q(y))
      }
      val exp = (num / (BigInt(na + nbuck) * (nb + nbuck))).toLong
      assert(got((sa, sb)) == exp, s"pair $sa/$sb")
      assert(exp >= 0, "same-sign factors force PSI >= 0")
    }
  }

  test("drift grid queries are partitioning-invariant") {
    for (n <- Seq("q273_dist_drift", "q276_vocab_divergence", "q277_psi_drift")) {
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
