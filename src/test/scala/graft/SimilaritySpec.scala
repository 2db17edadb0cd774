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
}
