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
}
