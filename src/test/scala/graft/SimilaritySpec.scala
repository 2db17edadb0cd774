package graft

import graft.operators.Similarity

/** The bounded-aggregator top-k (q32/q34's scale shape) must be
  * row-identical to the window-rank formulation it replaced — the same
  * exactness proof q78 pins for the count-scored variant, here on the
  * double-scored similarity path. Rows are compared as SORTED SEQS with
  * an explicit length check (a Set compare would mask duplicate-row
  * regressions in the bounded aggregator). */
class SimilaritySpec extends SparkSpec {

  private val dir = TestSession.sfDir

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
    df.collect().map(r => (
      r.getLong(r.fieldIndex("query_id")),
      r.getLong(r.fieldIndex("neighbor_id")),
      r.getDouble(r.fieldIndex("sim")),
      r.getInt(r.fieldIndex("rk")))).toSeq.sorted

  test("boundedTopK ≡ window rank on the IVF (same-cell) scored pairs") {
    val win = rows(Similarity.sparkTopK(spark, dir, sameCell = true))
    val agg = rows(Similarity.boundedTopK(Similarity.scoredPairs(spark, dir, sameCell = true)))
    assert(win.nonEmpty)
    assert(agg.size == win.size)
    assert(agg == win)
  }

  test("boundedTopK ≡ window rank on the full-corpus scored pairs") {
    val win = rows(Similarity.sparkTopK(spark, dir, sameCell = false))
    val agg = rows(Similarity.boundedTopK(Similarity.scoredPairs(spark, dir, sameCell = false)))
    assert(win.nonEmpty)
    assert(agg.size == win.size)
    assert(agg == win)
  }

  test("q205 semdedup census equals a BigDecimal in-memory replay") {
    val dir01 = "/root/testdata/sf0.01" // 500 vectors — sf0.001 is the same file
    val d = SparkEntry.all.find(_.name == "q205_semdedup").get
    def run(parts: String) = withSQLConf("spark.sql.shuffle.partitions" -> parts) {
      d.run(spark, dir01).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    }
    val got = run("4")
    assert(got == run("9"), "census must be partitioning-invariant")

    // Independent replay of the whole decision chain in exact BigDecimal
    // (same contract as the engines: quantize HALF_UP to 4dp, exact
    // squared distances and dots, double division only at the final
    // 4dp-rounded cosine).
    val emb: Map[Long, Array[BigDecimal]] = spark.read
      .parquet(s"$dir01/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)).toArray)
      .toMap
    // all arithmetic in exact integer ten-thousandths (the
    // sq_dist_long/dot_long contract: quantized grid scaled by 10^4)
    val embI: Map[Long, Array[Long]] = emb.map { case (id, v) =>
      id -> v.map(x => (x * 10000).toLongExact)
    }
    def sqdist(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    def dotL(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map(_ * _).sum
    val k = math.max(8L, math.floor(math.sqrt(emb.size.toDouble)).toLong)
    val cents = (0L until k).map(cid => cid -> embI(cid))
    val assign: Map[Long, (Long, Long)] = embI.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (sqdist(v, cv), cid) }
        .min.swap
    }
    val nl: Map[Long, Long] = embI.map { case (id, v) => id -> dotL(v, v) }
    def sim(a: Long, b: Long): Double =
      BigDecimal((dotL(embI(a), embI(b)).toDouble / 1e8) /
          (math.sqrt(nl(a).toDouble / 1e8) * math.sqrt(nl(b).toDouble / 1e8)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byCell = assign.keys.toSeq.groupBy(id => assign(id)._1)
    val removed = scala.collection.mutable.Set.empty[Long]
    for ((_, ids) <- byCell; s = ids.sorted;
         i <- s.indices; j <- (i + 1) until s.size
         if sim(s(i), s(j)) >= 0.4) {
      val (a, b) = (s(i), s(j))
      val (cda, cdb) = (assign(a)._2, assign(b)._2)
      removed += (if (cda > cdb) b else if (cda < cdb) a else math.max(a, b))
    }
    val expected = byCell.map { case (cid, ids) =>
      val rm = ids.count(removed)
      cid -> ((ids.size.toLong, rm.toLong, (ids.size - rm).toLong))
    }
    assert(got == expected, "census diverges from the BigDecimal replay")
    assert(removed.nonEmpty, "fixture should remove at least one near-dup")
    assert(got.values.map(_._1).sum == emb.size.toLong,
      "every vector is assigned exactly once")
  }

  test("q218 prototype-pruning census equals an integer replay of the quartile rule") {
    val dir01 = "/root/testdata/sf0.01"
    val embI: Map[Long, Array[Long]] = spark.read
      .parquet(s"$dir01/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        (BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          * 10000).toLongExact).toArray)
      .toMap
    def sqdist(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val k = math.max(8L, math.floor(math.sqrt(embI.size.toDouble)).toLong)
    val cents = (0L until k).map(cid => cid -> embI(cid))
    val assign: Map[Long, (Long, Long)] = embI.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (sqdist(v, cv), cid) }.min.swap
    }
    val expected = assign.toSeq.groupBy(_._2._1).map { case (cid, xs) =>
      val sorted = xs.map { case (id, (_, d)) => (d, id) }.sorted
      val nPruned = sorted.size / 4
      val pruned = sorted.take(nPruned)
      cid -> ((sorted.size.toLong, nPruned.toLong, (sorted.size - nPruned).toLong,
        pruned.lastOption.map(_._1)))
    }
    val got = SparkEntry.all.find(_.name == "q218_prototype_pruning").get
      .run(spark, dir01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got == expected, "pruning census diverges from the integer replay")
    assert(got.values.map(_._2).sum > 0, "fixture must prune at least one example")
    assert(got.values.map(_._1).sum == embI.size.toLong,
      "every vector is assigned exactly once")
  }

  test("q216 JL projection is exact and preserves pair distances within JL bounds") {
    val dir01 = "/root/testdata/sf0.01"
    // exact integer recompute on the 1e-4 grid, decoder- and plan-free
    val embI: Map[Long, Array[Long]] = spark.read
      .parquet(s"$dir01/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        (BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          * 10000).toLongExact).toArray)
      .toMap
    def proj(v: Array[Long]): Array[Long] =
      Array.tabulate(Similarity.JlDim) { j =>
        var s = 0L; var i = 1
        while (i <= Similarity.JlSrcDim) {
          s += Similarity.jlSign(i, j) * v(i - 1); i += 1
        }
        s
      }
    val expected = embI.map { case (id, v) =>
      proj(v).zipWithIndex.map { case (y, j) => (id, j.toLong, y) }
    }.flatten.toSet
    val got = SparkEntry.all.find(_.name == "q216_jl_projection").get
      .run(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "projection diverges from the integer recompute")

    // measured JL guarantee: for every pair among the first 30 vectors,
    // the unbiased projected estimate ||Ra-Rb||^2 * 3/k of ||a-b||^2
    // stays within loose-but-real distortion bounds for k = 16
    val projd = embI.view.mapValues(proj).toMap
    def sq(a: Array[Long], b: Array[Long]): Double =
      a.lazyZip(b).map((x, y) => (x - y).toDouble * (x - y).toDouble).sum
    val ids = embI.keys.toSeq.sorted.take(30)
    val ratios = (for { ai <- ids.indices; bi <- (ai + 1) until ids.size } yield {
      val (a, b) = (ids(ai), ids(bi))
      (sq(projd(a), projd(b)) * 3.0 / Similarity.JlDim) / sq(embI(a), embI(b))
    }).sorted
    assert(ratios.head > 0.2 && ratios.last < 3.0,
      s"distortion tails out of range: ${ratios.head} .. ${ratios.last}")
    val median = ratios(ratios.size / 2)
    assert(median > 0.75 && median < 1.3, s"median distortion $median off 1.0")
  }

  test("q230 SQ8 audit equals an integer replay; errors bounded by the scale") {
    val embI: Map[Long, Array[Long]] = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        (BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          * 10000).toLongExact).toArray)
      .toMap
    val expected = embI.map { case (id, v) =>
      val s = math.max(v.map(math.abs).max, 1L)
      val q = v.map(x => 127L * x / s)
      val errs = v.lazyZip(q).map((x, qq) => math.abs(127L * x - qq * s))
      val qn = q.map(x => x * x).sum
      val xn = v.map(x => x * x).sum
      id -> ((s, errs.sum, errs.max, 1000L * qn * s * s / (127L * 127L * xn)))
    }
    val got = SparkEntry.all.find(_.name == "q230_sq8_quantization").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected, "SQ8 audit diverges from the integer replay")
    // truncation error per coordinate is < s by construction, and the
    // quantized norm can never exceed the true norm (toward-zero trunc)
    got.foreach { case (id, (s, _, errMax, normPm)) =>
      assert(errMax < s, s"vec $id: per-coordinate error must stay below scale")
      assert(normPm <= 1000L, s"vec $id: truncation can only shrink the norm")
    }
  }

  test("q231 Matryoshka overlap equals a BigDecimal replay of both rankings") {
    val emb: Map[Long, Array[BigDecimal]] = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)).toArray)
      .toMap
    def top5(dim: Int): Map[Long, Seq[Long]] = {
      val sliced = emb.view.mapValues(_.take(dim)).toMap
      val nrm = sliced.view.mapValues(v => v.map(x => x * x).sum).toMap
      (0L until 10L).map { qid => // QueryVecs = 10 (operators-private)
        val scored = sliced.keys.filter(_ != qid).map { nid =>
          val sim = (sliced(qid).lazyZip(sliced(nid)).map(_ * _).sum /
            (BigDecimal(math.sqrt(nrm(qid).toDouble))
              * BigDecimal(math.sqrt(nrm(nid).toDouble))))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          (sim, nid)
        }.toSeq
        // rank() semantics: keep every row tied with the 5th
        val ordered = scored.sortBy { case (s, n) => (-s, n) }
        val cut = ordered.take(5).last._1 // TopK = 5 (operators-private)
        qid -> ordered.takeWhile { case (s, _) => s >= cut }.map(_._2)
      }.toMap
    }
    val full = top5(64)
    val trunc = top5(Similarity.JlDim)
    val expected = trunc.map { case (qid, ids) =>
      qid -> ((ids.count(full(qid).contains).toLong, ids.sorted.mkString(",")))
    }
    val got = SparkEntry.all.find(_.name == "q231_matryoshka_recall").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == expected, "overlap diverges from the BigDecimal replay")
    // the audit must be non-degenerate: some query keeps signal in the
    // 16-dim prefix (overlap > 0 somewhere) — all-zero means the slice
    // convention broke, not that the data is adversarial
    assert(got.values.exists(_._1 > 0), "prefix ranking lost all signal")
  }

  test("q232 Rand/purity equal a contingency recompute on the shared assignment") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
    val embI: Map[Long, Array[Long]] = rows
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        (BigDecimal(x.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          * 10000).toLongExact).toArray)
      .toMap
    val label: Map[Long, Int] = rows.map(r => r.getLong(0) -> r.getInt(2)).toMap
    def sqdist(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val k = math.max(8L, math.floor(math.sqrt(embI.size.toDouble)).toLong)
    val cents = (0L until k).map(cid => cid -> embI(cid))
    val assign: Map[Long, Long] = embI.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (sqdist(v, cv), cid) }.min._2
    }
    val ct = assign.toSeq.map { case (id, cid) => (cid, label(id)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def c2(n: Long) = n * (n - 1) / 2
    val n = ct.values.sum
    val aP = ct.values.map(c2).sum
    val rowP = ct.groupBy(_._1._1).values.map(g => c2(g.values.sum)).sum
    val colP = ct.groupBy(_._1._2).values.map(g => c2(g.values.sum)).sum
    val dP = c2(n) - rowP - colP + aP
    val purity = ct.groupBy(_._1._1).values.map(_.values.max).sum
    val expected = (n, ct.keys.map(_._1).toSet.size.toLong,
      ct.keys.map(_._2).toSet.size.toLong, aP, rowP - aP, colP - aP, dP,
      1000L * (aP + dP) / c2(n), 1000L * purity / n)
    val r = SparkEntry.all.find(_.name == "q232_clustering_eval").get
      .run(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    assert(got == expected, "Rand/purity diverge from the contingency recompute")
    // pair categories must partition C(n,2)
    assert(got._4 + got._5 + got._6 + got._7 == c2(n),
      "a+b+c+d must equal C(n,2)")
  }
}
