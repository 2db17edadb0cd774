package graft

import org.apache.spark.sql.functions._

/** Direct driver-side checks of the two sketch-flavored scan operators
  * added alongside the oracle rows: q97's Bloom accounting invariants
  * (structural guarantees a hash-mismatch would not localize) and
  * q98's rolling hash against an independent Scala fold.
  */
class BloomFingerprintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q97: bloom passes every true match, accounting is coherent") {
    val r = SparkEntry.all.find(_.name == "q97_bloom_prejoin").get
      .run(spark, sfDir).head()
    val (nFact, nPass, nExact, nFp, nBits) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // a Bloom filter may over-approve but NEVER drops a true match
    assert(nPass >= nExact, s"false negative: pass=$nPass < exact=$nExact")
    assert(nFp == nPass - nExact)
    assert(nPass <= nFact)
    assert(nBits <= 3 * 1024, "more set bits than 3 hash planes can hold")
    assert(nExact > 0, "threshold selected no orders — invariants vacuous")
  }

  test("q98: rolling hash equals an independent character fold") {
    val P = 1000000007L
    val got = SparkEntry.all.find(_.name == "q98_rolling_fingerprint").get
      .run(spark, sfDir).filter(col("doc_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val expect = text.codePoints().toArray
        .foldLeft(0L)((a, c) => (a * 131 + c) % P)
      assert(got(id) == expect, s"doc $id: got ${got(id)}, fold says $expect")
    }
  }
}
