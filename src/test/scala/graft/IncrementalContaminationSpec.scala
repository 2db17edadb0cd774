package graft

import graft.operators.IncrementalContamination
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The maintained contamination index must equal the batch computation:
  * shingles are per-doc absolute, so registering eval sets in any
  * number of increments and then checking the train corpus yields
  * EXACTLY q92's one-shot output. This is the invariant that lets a
  * pipeline decontaminate against a growing benchmark registry without
  * re-shingling eval history.
  */
class IncrementalContaminationSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sfDir)

  private def tmp(): String =
    Files.createTempDirectory("graft-inccontam").toString

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("incrementally registered eval sets reproduce batch q92 exactly") {
    val index = tmp()
    // q92's eval registry (doc_id % 50 = 0), arriving in two drops
    val evalA = docs.filter(col("doc_id") % 100 === 0)
    val evalB = docs.filter(col("doc_id") % 100 === 50)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    IncrementalContamination.materialize(evalA, index)
    IncrementalContamination.append(evalB, index, ingestId = 1L)

    val inc = collect(IncrementalContamination.contamination(train, index))
    val batch = collect(
      SparkEntry.all.find(_.name == "q92_contamination").get.run(spark, sfDir))

    assert(inc == batch, s"inc=$inc batch=$batch")
    assert(inc.exists { case (_, nDocs, _) => nDocs > 0 },
      "no contamination hits at all — the invariant check is vacuous")
    assert(inc.size == evalA.count() + evalB.count(),
      "every registered eval doc must appear in the report, hits or not")
  }

  test("a retried registration overwrites its own ingest, not duplicates it") {
    val index = tmp()
    val evalA = docs.filter(col("doc_id") % 100 === 0)
    val evalB = docs.filter(col("doc_id") % 100 === 50)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    IncrementalContamination.materialize(evalA, index)
    IncrementalContamination.append(evalB, index, ingestId = 1L)
    IncrementalContamination.append(evalB, index, ingestId = 1L) // retry

    val once = collect(IncrementalContamination.contamination(train, index))
    val batch = collect(
      SparkEntry.all.find(_.name == "q92_contamination").get.run(spark, sfDir))
    assert(once == batch, "retried append changed the report")
  }
}
