package graft

import graft.operators.TrainingOps

/** q246 batch-perceptron quality gate on fixtures where the right
  * answer is known: a lexically separable corpus must be separated
  * (every ref-source doc kept, every crawl doc rejected), mixed-vocab
  * docs must land by their dominant vocabulary, and the census must be
  * invariant to input order (batch updates are order-independent —
  * that's what makes the oracle's CTE unroll derive identical weights).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def census(passes: Int, docs: (Long, String, String)*): Map[String, (Long, Long, Long)] =
    TrainingOps.perceptronCensus(
      docs.toSeq.toDF("doc_id", "text", "source"), Seq("src1", "src2"), passes)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  // two disjoint vocabularies: "curated" tokens for ref docs, "crawl"
  // tokens for the rest (hash collisions across 256 buckets may merge
  // a pair of tokens, which the margin absorbs)
  private def good(seed: Int) = (0 until 12).map(i => s"curated${(seed + i) % 20}").mkString(" ")
  private def crawl(seed: Int) = (0 until 12).map(i => s"spam${(seed + i) % 20}").mkString(" ")

  test("separable corpus: every ref doc kept, every crawl doc rejected") {
    val docs =
      (0 until 8).map(i => (i.toLong, good(i), if (i % 2 == 0) "src1" else "src2")) ++
        (8 until 28).map(i => (i.toLong, crawl(i), s"src${3 + i % 4}"))
    val got = census(3, docs: _*)
    assert(got("src1") == ((4L, 4L, got("src1")._3)) && got("src1")._3 > 0,
      s"ref src1 not fully kept: $got")
    assert(got("src2")._1 == 4L && got("src2")._2 == 4L && got("src2")._3 > 0)
    (3 to 6).foreach { k =>
      val (n, sel, margin) = got(s"src$k")
      assert(sel == 0L && margin < 0, s"crawl src$k leaked through the gate: $got")
      assert(n == 5L)
    }
  }

  test("mixed-vocab docs land by dominant vocabulary") {
    // doc 100 is mostly curated tokens with light spam; doc 101 the
    // reverse — both live in a crawl source, so only the LEARNED
    // lexical signal (not the label) can separate them
    val base =
      (0 until 8).map(i => (i.toLong, good(i), if (i % 2 == 0) "src1" else "src2")) ++
        (8 until 24).map(i => (i.toLong, crawl(i), s"src${3 + i % 2}"))
    val probe = Seq(
      (100L, good(3) + " spam0 spam1", "probe_hi"),
      (101L, crawl(3) + " curated0 curated1", "probe_lo"))
    val got = census(3, (base ++ probe): _*)
    assert(got("probe_hi") == ((1L, 1L, got("probe_hi")._3)) && got("probe_hi")._3 > 0,
      s"curated-dominant probe rejected: $got")
    assert(got("probe_lo")._2 == 0L && got("probe_lo")._3 < 0,
      s"spam-dominant probe kept: $got")
  }

  test("census is invariant to input order (batch updates commute)") {
    val docs =
      (0 until 8).map(i => (i.toLong, good(i), if (i % 2 == 0) "src1" else "src2")) ++
        (8 until 28).map(i => (i.toLong, crawl(i), s"src${3 + i % 4}"))
    val a = census(3, docs: _*)
    val b = census(3, docs.reverse: _*)
    assert(a == b, "per-pass batch updates must not depend on row order")
  }
}
