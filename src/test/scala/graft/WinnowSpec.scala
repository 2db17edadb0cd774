package graft

import graft.plans.{RollingHashConsts, Winnow, WinnowConsts}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The winnowing kernel (plans/Winnow, q152) against an independent
  * reference implementation, its published guarantee, and the
  * sliding-span duplication detector (q151) against brute force.
  */
class WinnowSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Straightforward reference: gram hashes via functional fold,
    * window minima via sliding, distinct+sorted via stdlib. */
  private def reference(s: String): Seq[Long] = {
    import RollingHashConsts.{Base, Mod}
    import WinnowConsts.{K, W}
    val cps = s.codePoints().toArray.toSeq
    val grams = cps.sliding(K).filter(_.size == K).toVector
    if (grams.isEmpty) Seq.empty
    else {
      val hs = grams.map(_.foldLeft(0L)((a, c) => (a * Base + c) % Mod))
      val wins =
        if (hs.size <= W) Vector(hs) else hs.sliding(W).toVector
      wins.map(_.min).distinct.sorted
    }
  }

  private def kernel(s: String): Seq[Long] =
    Winnow.compute(s).toLongArray().toSeq

  test("kernel equals the reference on random strings (incl. short, empty, unicode)") {
    val genChar = Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.const('é')),
      (1, Gen.const('中')))
    val genStr = Gen.chooseNum(0, 120).flatMap(n => Gen.stringOfN(n, genChar))
    check(Prop.forAll(genStr) { s => kernel(s) == reference(s) })
  }

  test("winnowing guarantee: a shared passage of w+k-1 chars yields a shared fingerprint") {
    import WinnowConsts.{K, W}
    val genStr = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val genShared = Gen.stringOfN(W + K - 1, Gen.alphaNumChar)
    check(Prop.forAll(genStr, genStr, genStr, genStr, genShared) {
      (a1, a2, b1, b2, sharedS) =>
        val fa = kernel(a1 + sharedS + a2).toSet
        val fb = kernel(b1 + sharedS + b2).toSet
        fa.intersect(fb).nonEmpty
    })
  }

  test("q152 through the DataFrame (codegen path) equals the kernel per doc") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = byName("q152_winnowing").run(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    val expected = texts.view.mapValues(t => reference(t)).filter(_._2.nonEmpty).toMap
    assert(got == expected.toMap, "codegen winnowing diverges from kernel reference")
    // density sanity: selection is a genuine subsample of the gram space
    val doc = texts.maxBy(_._2.length)
    assert(kernel(doc._2).size < doc._2.length - WinnowConsts.K + 1)
  }

  test("q151 duplicated spans equal a brute-force token-window recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))

    val spans = docs.flatMap { case (id, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      w.sliding(12).filter(_.length == 12).map(s => id -> s.mkString(" "))
    }
    val expected = spans.groupBy(_._2).collect {
      case (_, occ) if occ.map(_._1).distinct.size >= 2 =>
        val ids = occ.map(_._1)
        (occ.head._2.hashCode, ids.distinct.size.toLong, occ.size.toLong, ids.min)
    }
    // compare on (n_docs, n_occurrences, first_doc) multisets — the md5
    // span key is content-addressed, so multiset equality + count match
    // pins the same groups without recomputing md5 here
    val got = byName("q151_dup_spans").run(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == expected.size, s"${got.length} vs ${expected.size} groups")
    assert(got.map(t => (t._1, t._2, t._3)).sorted.toSeq ==
      expected.map(t => (t._2, t._3, t._4)).toSeq.sorted, "span group stats diverge")
  }

  test("q156 PMI ranking equals a brute-force rational recompute") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val tokss = texts.map(_.split(" ", -1)) // keep empties like split(col, " ")
    val uni = tokss.flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nU = uni.values.sum
    val pairsAll = tokss.filter(_.length >= 2)
      .flatMap(w => w.zip(w.drop(1)))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
    val cab = pairsAll.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nB = cab.values.sum
    val expected = cab.toSeq.filter(_._2 >= 5).map { case ((a, b), c) =>
      val ppm = (BigInt(c) * nU * nU * 1000000) / (BigInt(nB) * uni(a) * uni(b))
      (s"$a $b", c, uni(a), uni(b), ppm.toLong)
    }.sortBy(t => (-t._5, t._1)).take(30)

    val got = byName("q156_pmi_collocations").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected, "PMI collocations diverge from brute force")
    assert(got.nonEmpty, "fixture yields no supported collocations")
  }

  test("q158 source-overlap matrix equals a brute-force span-set recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val spansBySource = docs.groupBy(_._1).view.mapValues { ds =>
      ds.flatMap { case (_, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        w.sliding(12).filter(_.length == 12).map(_.mkString(" "))
      }.toSet
    }.toMap
    val expected = (for {
      (sa, spa) <- spansBySource.toSeq
      (sb, spb) <- spansBySource.toSeq if sa != sb
      shared = spa.intersect(spb).size if shared > 0
    } yield (sa, sb) -> ((shared.toLong, spa.size.toLong))).toMap

    val got = byName("q158_source_overlap").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected, "source overlap diverges from brute force")
    assert(got.nonEmpty, "fixture has no cross-source span overlap")
  }

  test("q168 novelty equals a brute-force first-occurrence recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))

    val docShingles = docs.map { case (id, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      id -> w.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val firstHost = docShingles
      .flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = docShingles.map { case (id, ss) =>
      val novel = ss.count(sh => firstHost(sh) == id).toLong
      id -> ((ss.size.toLong, novel, 1000L * novel / ss.size))
    }.toMap

    val got = byName("q168_shingle_novelty").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, "novelty diverges from brute force")
    // the signal discriminates: both novel and seen-before content exist
    assert(got.values.exists(_._3 < 1000) && got.values.exists(_._3 > 0),
      "fixture should contain both novel and duplicated shingles")
  }

  test("q171 calibration equals a brute-force minhash + Jaccard recompute") {
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // 3-gram shingles exactly as Dedup builds them: split on single
    // space, every offset, distinct
    val shing = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val sig = shing.collect { case (id, ss) if ss.nonEmpty =>
      id -> (0 until 8).map(i => ss.map(sh => md5hex(sh + ":" + i)).min)
    }
    val got = byName("q171_minhash_calibration").run(spark, sfDir).collect()
    assert(got.nonEmpty, "no LSH candidates in fixture")
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val nm = (0 until 8).count(i => sig(a)(i) == sig(b)(i)).toLong
      val inter = (shing(a) & shing(b)).size.toLong
      val uni = (shing(a) | shing(b)).size.toLong
      assert(r.getLong(2) == nm, s"($a,$b) n_match")
      assert(r.getLong(3) == 1000L * nm / 8, s"($a,$b) est")
      assert(r.getLong(4) == 1000L * inter / uni, s"($a,$b) exact")
      assert(r.getLong(5) == math.abs(1000L * nm / 8 - 1000L * inter / uni),
        s"($a,$b) err")
    }
  }

  test("winnow/span/collocation queries are registered with oracles") {
    Seq("q151_dup_spans", "q152_winnowing", "q156_pmi_collocations",
      "q158_source_overlap", "q168_shingle_novelty",
      "q171_minhash_calibration").foreach { n =>
      assert(SparkEntry.queries.contains(n), n)
      assert(SparkEntry.oracleSql.contains(n), n)
    }
  }
}
