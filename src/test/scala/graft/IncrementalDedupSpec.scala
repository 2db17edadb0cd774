package graft

import graft.operators.IncrementalDedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The incremental path must equal the batch path: signatures are
  * per-doc absolute, so deduping a new drop against a materialized
  * store yields EXACTLY the pairs the full-corpus computation finds for
  * those docs. This is the invariant that lets a 100 TB pipeline dedup
  * incrementally without ever re-running history.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def tmp(): String =
    Files.createTempDirectory("graft-incdedup").toString

  test("incremental match over a split store equals the batch computation") {
    val store = tmp()
    val cut = 300L
    val old = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)
    IncrementalDedup.materialize(old, store)

    val inc = IncrementalDedup.matchNew(fresh, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // batch twin: same candidate/verify criterion over the FULL corpus,
    // restricted to pairs whose higher id is a new doc
    val allSig = IncrementalDedup.signatures(docs)
    val batch = IncrementalDedup.candidatePairs(
        allSig.filter(col("doc_id") >= cut), allSig, minAgree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(inc == batch, s"inc=$inc batch=$batch")
    assert(inc.nonEmpty, "split produced no near-dup pairs — cut is untestable")
    // dup partner is always an earlier doc, never self
    inc.foreach { case (d, of, _) => assert(of < d) }
  }

  test("append is idempotent per ingest and the store converges to the full corpus") {
    val store = tmp()
    val old = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
    IncrementalDedup.materialize(old, store)
    IncrementalDedup.append(b1, store, ingestId = 1L)
    IncrementalDedup.append(b1, store, ingestId = 1L) // retry: overwrite, not dup

    val stored = spark.read.parquet(store).drop("ingest")
    val expected = IncrementalDedup.signatures(
      docs.filter(col("doc_id") < 400))
    assert(stored.count() == expected.count())
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty)
  }
}
