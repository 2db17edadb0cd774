package graft

import graft.operators.Dedup

/** q245 ExactSubstr census (Lee et al. 2021 §4.1) against fixtures with
  * PLANTED long duplicates where the removal plan is known by hand:
  * covered-token totals, merged-interval counts, and longest runs are
  * asserted exactly, including the interval-union edge cases (overlap,
  * adjacency, disjoint runs) and the collision-verification property
  * that a window must recur VERBATIM to count.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  /** doc text = tokens joined by single spaces. */
  private def census(l: Int, docs: (Long, Seq[String])*): Map[Long, (Long, Long, Long, Long)] =
    Dedup.exactSubstrCensus(
      docs.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }.toDF("doc_id", "text"), l)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a planted shared passage is fully covered in both hosts; clean docs absent") {
    // docs A and B share a verbatim 60-token passage at different
    // offsets; doc C is all-unique. At L=50, the duplicated windows in
    // each host are the 11 anchors i..i+10 inside the passage, whose
    // union is exactly the 60 passage tokens.
    val shared = toks("dup", 60)
    val a = toks("a", 7) ++ shared ++ toks("a2", 5)   // passage at 8..67 of 72
    val b = toks("b", 20) ++ shared                   // passage at 21..80 of 80
    val c = toks("c", 90)
    val got = census(50, (1L, a), (2L, b), (3L, c))
    assert(got == Map(
      1L -> ((72L, 60L, 1L, 60L)),
      2L -> ((80L, 60L, 1L, 60L))),
      s"unexpected census: $got")
  }

  test("two disjoint planted passages yield two runs; overlap merges to one") {
    // doc 1 hosts two copies of a 50-token passage separated by 51
    // unique tokens -> two maximal runs of 50 each (and the doc is its
    // own duplicate source: within-doc repeats count, per the paper)
    val p = toks("p", 50)
    val d1 = p ++ toks("gap", 51) ++ p
    val got1 = census(50, (1L, d1))
    assert(got1 == Map(1L -> ((151L, 100L, 2L, 50L))), s"disjoint: $got1")

    // doc 2 + doc 3: 55 shared tokens -> anchors 6 apart merge into ONE
    // 55-token run, not two
    val q = toks("q", 55)
    val got2 = census(50, (2L, q ++ toks("x", 10)), (3L, toks("y", 3) ++ q))
    assert(got2 == Map(
      2L -> ((65L, 55L, 1L, 55L)),
      3L -> ((58L, 55L, 1L, 55L))), s"overlap: $got2")
  }

  test("adjacent runs merge; near-miss (one token changed) does not count") {
    // doc 1 = two different 50-token passages back to back, each
    // duplicated elsewhere -> coverage [1,50] and [51,100] adjoin into
    // one 100-token run
    val p1 = toks("m", 50)
    val p2 = toks("n", 50)
    val got = census(50, (1L, p1 ++ p2), (2L, p1), (3L, p2))
    assert(got(1L) == ((100L, 100L, 1L, 100L)), s"adjacency: $got")
    assert(got(2L) == ((50L, 50L, 1L, 50L)) && got(3L) == ((50L, 50L, 1L, 50L)))

    // a 50-token window that differs in ONE token is NOT a duplicate
    val almost = p1.updated(25, "CHANGED")
    val got2 = census(50, (4L, p1 ++ toks("u", 5)), (5L, almost ++ toks("v", 5)))
    assert(got2.isEmpty, s"near-miss must not count: $got2")
  }

  test("docs shorter than L produce no anchors") {
    val p = toks("s", 49)
    assert(census(50, (1L, p), (2L, p)).isEmpty,
      "49-token docs cannot host a 50-token duplicated window")
  }
}
