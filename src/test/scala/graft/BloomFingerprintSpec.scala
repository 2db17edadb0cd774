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

  test("q98: rolling hashes equal an independent character fold") {
    val P = 1000000007L
    def fold(cs: Array[Int]): Long = cs.foldLeft(0L)((a, c) => (a * 131 + c) % P)
    val got = SparkEntry.all.find(_.name == "q98_rolling_fingerprint").get
      .run(spark, sfDir).filter(col("doc_id") < 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val cs = text.codePoints().toArray
      assert(got(id)._1 == fold(cs), s"doc $id full hash mismatch")
      val minBlock = cs.grouped(64).map(fold).min
      assert(got(id)._2 == minBlock, s"doc $id min block hash mismatch")
    }
  }

  test("rolling hash expressions: empty, sub-block, exact-block, multi-byte inputs") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val rows = Seq("", "ab", "x" * 64, "x" * 65, "héllo wörld", null)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val out = rows.toDF("id", "t")
      .select(col("id"), call_function("rolling_hash", col("t")).as("h"),
        call_function("rolling_minblock_hash", col("t")).as("mb"))
      .orderBy("id").collect()
    // empty string: full hash is the fold's zero seed, min-block is null
    assert(out(0).getLong(1) == 0L && out(0).isNullAt(2))
    // one short block: min-block == full hash
    assert(out(1).getLong(1) == out(1).getLong(2))
    // exactly one full block: min-block == full hash
    assert(out(2).getLong(1) == out(2).getLong(2))
    // 65 chars: blocks are hash(64 x's) and hash("x") — min is their min
    val hx = (0 until 64).foldLeft(0L)((a, _) => (a * 131 + 'x') % 1000000007L)
    assert(out(3).getLong(2) == math.min(hx, 'x'.toLong))
    // multi-byte chars fold by CODE POINT, like ascii(substr(...))
    val h5 = "héllo wörld".codePoints().toArray
      .foldLeft(0L)((a, c) => (a * 131 + c) % 1000000007L)
    assert(out(4).getLong(1) == h5)
    // null propagates
    assert(out(5).isNullAt(1) && out(5).isNullAt(2))
  }
}
