package graft

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.Merge

import scala.util.Random

/** The distributed BPE trainer must learn EXACTLY the merge sequence
  * of the in-memory reference implementation — same pair counts, same
  * deterministic tie-break — on random corpora, plus the classic
  * hand-checkable cases.
  */
class BpeTrainerSpec extends SparkSpec {

  private def histogram(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("applyMerge is left-to-right non-overlapping") {
    assert(BpeTrainer.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") == IndexedSeq("aa", "a"))
    assert(BpeTrainer.applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") == IndexedSeq("aa", "aa"))
    assert(BpeTrainer.applyMerge(IndexedSeq("x", "a", "b", "y", "a", "b"), "a", "b") ==
      IndexedSeq("x", "ab", "y", "ab"))
    assert(BpeTrainer.applyMerge(IndexedSeq.empty, "a", "b") == IndexedSeq.empty)
  }

  test("reference trainer on the classic hand example") {
    // "low" x5, "lower" x2: first merge is (l,o) count 7, then (lo,w) 7
    val merges = BpeTrainer.trainLocal(Map("low" -> 5L, "lower" -> 2L), 2)
    assert(merges == Seq(Merge("l", "o", 7L), Merge("lo", "w", 7L)))
  }

  test("distributed trainer == reference on random corpora") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val alphabet = "abcd"
      val texts = Seq.fill(60) {
        Seq.fill(rnd.nextInt(8) + 1)(
          Seq.fill(rnd.nextInt(6) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
        ).mkString(" ")
      }
      val k = 8
      val expected = BpeTrainer.trainLocal(histogram(texts), k)
      val got = BpeTrainer.train(texts.toDF("text"), "text", k)
      assert(got == expected, s"trial $trial: $got != $expected")
      assert(got.size == k) // corpora this size never run dry in 8 rounds
    }
  }

  test("distributed trainer on the documents table is deterministic and well-formed") {
    val docs = Tables.documents(spark, TestSession.sfDir)
    val m1 = BpeTrainer.train(docs, "text", 5)
    val m2 = BpeTrainer.train(docs, "text", 5)
    assert(m1 == m2) // partitioning-independent
    assert(m1.size == 5)
    // counts are non-increasing is NOT guaranteed by BPE in general,
    // but each learned merge must have a positive weighted count and
    // merged symbols must concatenate
    assert(m1.forall(_.count > 0))
    // later merges may reference earlier merge outputs: every merge's
    // symbols are built from characters of the corpus
    assert(m1.forall(m => m.left.nonEmpty && m.right.nonEmpty))
  }

  test("vocabulary running dry stops early") {
    // single word "ab" repeated: only one pair exists -> 1 merge, then dry
    val merges = BpeTrainer.trainLocal(Map("ab" -> 10L), 5)
    assert(merges == Seq(Merge("a", "b", 10L)))
  }
}
