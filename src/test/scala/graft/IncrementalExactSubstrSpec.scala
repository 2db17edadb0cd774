package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, IncrementalExactSubstr => IES}

/** Incremental ExactSubstr ≡ full recompute: maintaining the anchor
  * store across ingest batches must reproduce exactly the census q245's
  * content-verified batch path computes from scratch on the unioned
  * corpus — including an OLD doc whose removal plan changes because a
  * NEW doc duplicates a passage of it, and the maintenance equation
  * delta ∪ (prior minus delta-docs) == full.
  */
class IncrementalExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")
  private def doc(id: Long, ws: Seq[String]): (Long, String) = (id, ws.mkString(" "))

  private val p1 = toks("p1x", 55) // shared by base docs 1 and 2
  private val p2 = toks("p2x", 60) // unique in base doc 1; new doc 10 repeats it
  private val p3 = toks("p3x", 52) // new-new duplicate (docs 11 and 12)

  private val base = Seq(
    doc(1L, toks("a", 5) ++ p1 ++ toks("b", 3) ++ p2),
    doc(2L, p1 ++ toks("c", 8)),
    doc(3L, toks("d", 70))) // clean, never affected
  private val batch = Seq(
    doc(10L, toks("e", 4) ++ p2),
    doc(11L, p3 ++ toks("f", 6)),
    doc(12L, toks("g", 2) ++ p3),
    doc(13L, toks("h", 60))) // clean new doc

  private def census(rows: Seq[(Long, String)]): Map[Long, Seq[Long]] =
    Dedup.exactSubstrCensus(rows.toDF("doc_id", "text"), IES.L)
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("censusDelta ≡ full recompute on affected docs; maintenance equation holds") {
    val store = Files.createTempDirectory("graft-ies").toString
    IES.materialize(base.toDF("doc_id", "text"), store)

    val priorFull = census(base)
    // base state sanity: docs 1/2 share p1; doc 1's p2 not yet duplicated
    assert(priorFull.keySet == Set(1L, 2L))

    val delta = IES.censusDelta(batch.toDF("doc_id", "text"), store)
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val full = census(base ++ batch)

    // affected set: doc 1 (old doc gaining a run via p2), 10, 11, 12 —
    // never doc 2 (its only dup hash p1 is absent from the batch),
    // never the clean docs 3/13
    assert(delta.keySet == Set(1L, 10L, 11L, 12L),
      s"affected set wrong: ${delta.keySet}")
    // every delta row equals the from-scratch content-verified row
    delta.foreach { case (id, row) =>
      assert(row == full(id), s"doc $id: delta $row != full ${full(id)}")
    }
    // doc 1 now carries TWO runs (p1 and p2) — the old-doc revision
    assert(delta(1L)(2) == 2L, s"doc 1 should have 2 runs: ${delta(1L)}")
    // maintenance equation: delta ∪ (prior minus delta-docs) == full
    val maintained = delta ++ priorFull.view.filterKeys(!delta.contains(_)).toMap
    assert(maintained == full, s"maintained $maintained != full $full")

    // append keeps the store current: a SECOND batch re-duplicating p1
    // must now revise doc 2 as well, from history alone
    IES.append(batch.toDF("doc_id", "text"), store, ingestId = 1L)
    val batch2 = Seq(doc(20L, p1 ++ toks("z", 9)))
    val delta2 = IES.censusDelta(batch2.toDF("doc_id", "text"), store)
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val full2 = census(base ++ batch ++ batch2)
    assert(delta2.keySet == Set(1L, 2L, 20L), s"second delta: ${delta2.keySet}")
    delta2.foreach { case (id, row) =>
      assert(row == full2(id), s"doc $id: delta2 $row != full ${full2(id)}")
    }
  }

  test("anchors are row-local and absolute (store rows never change)") {
    val a1 = IES.anchors(base.toDF("doc_id", "text"))
      .collect().map(_.toString).sorted
    val a2 = IES.anchors((batch ++ base).toDF("doc_id", "text"))
      .filter(col("doc_id").isin(base.map(_._1): _*))
      .collect().map(_.toString).sorted
    assert(a1.sameElements(a2),
      "a doc's anchor rows depend on the rest of the corpus")
  }
}
