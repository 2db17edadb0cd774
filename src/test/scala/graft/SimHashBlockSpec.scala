package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** q77's Hamming-distance search rests on the block scheme of
  * Manku/Jain/Das Sarma (WWW 2007, §3): 60 signature bits in 5 blocks
  * of 12, candidate buckets keyed on the C(5,2)=10 block PAIRS. Two
  * claims carry the query and are proven here independently of the SQL:
  *
  *  1. COMPLETENESS (property): any two signatures within Hamming
  *     distance 3 share at least one block-pair key — <=3 flipped bits
  *     touch <=3 blocks, so >=2 blocks (hence >=1 pair) agree exactly.
  *  2. END-TO-END (pipeline): at sf0.001, q77's output equals a
  *     brute-force all-pairs Hamming join over an INDEPENDENT pure-
  *     Scala reimplementation of the 60-bit SimHash (MessageDigest md5,
  *     no Spark expressions shared with the query under test).
  */
class SimHashBlockSpec extends SparkSpec {

  /** The 10 unordered pairs of 12-bit blocks, mirroring the CASE tables
    * in Dedup.q77 (c ascending). */
  private val blockPairs: Seq[(Int, Int)] =
    for (i <- 0 until 5; j <- (i + 1) until 5) yield (i, j)

  private def blockVal(sig: Long, blk: Int): Long = (sig >> (12 * blk)) & 0xfff

  private def pairKeys(sig: Long): Seq[Long] =
    blockPairs.map { case (i, j) => blockVal(sig, i) * 4096 + blockVal(sig, j) }

  test("block-pair keys are complete for Hamming distance <= 3 " +
    "(any <=3-bit flip of any 60-bit signature shares a key)") {
    val genSig = Gen.chooseNum(0L, (1L << 60) - 1)
    val genFlips = Gen.chooseNum(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 59)))
    val p = Prop.forAll(genSig, genFlips) { (sig, flips) =>
      val other = flips.foldLeft(sig)((s, b) => s ^ (1L << b))
      val shared = pairKeys(sig).zip(pairKeys(other)).exists { case (a, b) => a == b }
      Prop.propBoolean(shared) :|
        s"sig=$sig flips=$flips: no shared block-pair key"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  /** Independent 60-bit SimHash: java MessageDigest md5 hex, first 15
    * nibbles, bit p of nibble p/4 selected MSB-first, +1/-1 majority
    * over DISTINCT whitespace tokens, bit set when the sum is >= 0. */
  private def simhash60(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bsum = new Array[Int](60)
    text.split(" ").distinct.foreach { w =>
      val hex = md.digest(w.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      var p = 0
      while (p < 60) {
        val nib = Integer.parseInt(hex.substring(p / 4, p / 4 + 1), 16)
        bsum(p) += (if (((nib >> (3 - p % 4)) & 1) == 1) 1 else -1)
        p += 1
      }
    }
    (0 until 60).foldLeft(0L)((acc, p) =>
      if (bsum(p) >= 0) acc | (1L << (59 - p)) else acc)
  }

  test("q77 equals a brute-force Hamming join over an independent " +
    "pure-Scala 60-bit SimHash at sf0.001") {
    val docs = spark.read.parquet(s"${TestSession.sfDir}/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> simhash60(r.getString(1)))
      .sortBy(_._1)
    val expected = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      h = java.lang.Long.bitCount(docs(i)._2 ^ docs(j)._2)
      if h <= 3
    } yield (docs(i)._1, docs(j)._1, h)).toSet
    assert(expected.nonEmpty, "fixture has no near-dup pairs — test is vacuous")

    val got = SparkEntry.queries("q77_simhash_hamming")(spark, TestSession.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(got == expected,
      s"q77 mismatch: ${(expected -- got).take(5)} missing, ${(got -- expected).take(5)} extra")
  }
}
