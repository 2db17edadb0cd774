package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental benchmark decontamination — q92's check against a
  * MAINTAINED shingle index instead of a recomputed one. Real pipelines
  * decontaminate against a GROWING registry of held-out benchmarks: new
  * eval sets arrive over time, and the 100 TB train side must be
  * checkable against all of them without re-shingling the eval history
  * on every run.
  *
  * The index holds the distinct 5-gram shingles of every registered
  * eval document ([[Curation.fiveGramShingles]] — row-local, so a
  * doc's index rows never depend on what else is registered; that is
  * the property that makes the incremental and batch paths provably
  * identical, see IncrementalContaminationSpec) plus the registered
  * eval ids themselves (kept separately so eval docs too short to
  * produce a single shingle still appear in reports with zero hits).
  *
  * Each registration lands in its own `ingest=<id>` partition — a
  * retried batch overwrites only its own subtree, the same idempotency
  * contract as IncrementalDedup's signature store.
  *
  * Checking a train corpus against the index is exactly q92's scale
  * asymmetry: the index side (benchmarks — KBs to MBs) BROADCASTS, the
  * corpus-sized train side streams through a broadcast hash join and
  * never shuffles; only matched hit pairs reach the small eval-keyed
  * aggregate.
  */
object IncrementalContamination {

  private def shingles(evalDocs: DataFrame): DataFrame =
    Curation.fiveGramShingles(evalDocs).withColumnRenamed("doc_id", "eval_id")

  private def ids(evalDocs: DataFrame): DataFrame =
    evalDocs.select(col("doc_id").as("eval_id")).distinct()

  /** Create/overwrite the index from a base eval registry. */
  def materialize(evalDocs: DataFrame, indexPath: String): Unit = {
    shingles(evalDocs).withColumn("ingest", lit(0L))
      .write.mode("overwrite").partitionBy("ingest").parquet(s"$indexPath/shingles")
    ids(evalDocs).withColumn("ingest", lit(0L))
      .write.mode("overwrite").partitionBy("ingest").parquet(s"$indexPath/ids")
  }

  /** Register one new eval set (idempotent per ingest id). Caller
    * contract: a doc id registers once across all ingests — eval sets
    * are disjoint benchmarks, and a re-registered id would double its
    * index rows. */
  def append(evalDocs: DataFrame, indexPath: String, ingestId: Long): Unit = {
    require(ingestId > 0, "ingest 0 is the materialized base")
    // The ingest=<id> directory carries the partition value; writing it
    // into the data files too would diverge from the materialized base's
    // schema (which strips it via partitionBy).
    shingles(evalDocs).write.mode("overwrite").parquet(s"$indexPath/shingles/ingest=$ingestId")
    ids(evalDocs).write.mode("overwrite").parquet(s"$indexPath/ids/ingest=$ingestId")
  }

  /** Contamination report of `train` against every registered eval doc:
    * (eval_id, n_train_docs, n_shared_shingles), zero-filled — the same
    * output contract as q92. */
  def contamination(train: DataFrame, indexPath: String): DataFrame = {
    val spark = train.sparkSession
    val idx = spark.read.parquet(s"$indexPath/shingles").drop("ingest")
    val registered = spark.read.parquet(s"$indexPath/ids").drop("ingest")
    val trainG = Curation.fiveGramShingles(train).withColumnRenamed("doc_id", "train_id")
    val hits = trainG.join(broadcast(idx), "sh")
      .groupBy(col("eval_id"))
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        countDistinct(col("sh")).as("n_shared_shingles"))
    registered.join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("n_shared_shingles"), lit(0L)).as("n_shared_shingles"))
  }
}
