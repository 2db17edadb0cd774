package graft.jobs

import graft.operators.ViewsPipeline
import graft.sources.{EventLog, IncrementalScan}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Glue ETL job as a library job (reference
  * glue_cf_template.json:121-147: read viewsInputS3Path, filter against
  * the suspicious-IP table, write outputJobS3Path, job bookmarks on) —
  * composed entirely from the engine's operators:
  *
  *   S1 hourly CSV scan → F3-F8 clean → F1/F2 TTL'd IP filter →
  *   F5 partition columns → K6 curated parquet, processed incrementally
  *   (IncrementalScan = the bookmark).
  *
  * One call = one EMR-step/Glue-run equivalent (SURVEY.md §3.3/§3.4).
  */
object BatchViewsJob {

  final case class Result(rowsProcessed: Long)

  def run(s: SparkSession, inPrefix: String, snapshotPath: String,
      outPath: String, markPath: String): Result = {
    // prune done hours at the filesystem listing (O(new), not
    // O(history) — the bookmark contract); IncrementalScan re-applies
    // the same predicate on the derived columns as defense in depth
    val raw = EventLog.readHourlyCsvSince(s, inPrefix,
      IncrementalScan.readMark(s, markPath))
    val cleaned = ViewsPipeline.clean(raw)
    val snapshot = ViewsPipeline.readSnapshotOrEmpty(s, snapshotPath)
    val partitioned = ViewsPipeline.withPartitionColumns(cleaned)
    val n = IncrementalScan.step(s, partitioned, markPath,
      df => ViewsPipeline.filterSuspicious(df, snapshot, current_timestamp()),
      outPath)
    Result(n)
  }

  /** The companion detection job (the "Batch Job to find out suspicious
    * IPs" EMR step): scan the curated/raw hours, detect, refresh the
    * TTL'd snapshot (K4). */
  def detectAndSnapshot(s: SparkSession, inPrefix: String, snapshotPath: String,
      ttlHours: Int = 24): Long = {
    val cleaned = ViewsPipeline.clean(EventLog.readHourlyCsv(s, inPrefix))
    val detected = ViewsPipeline.detectSuspicious(cleaned)
    val snap = ViewsPipeline.suspiciousSnapshot(detected, current_timestamp(), ttlHours)
    snap.write.mode("overwrite").parquet(snapshotPath)
    s.read.parquet(snapshotPath).count()
  }

  /** Periodic snapshot compaction (SURVEY §4: "read-time filter +
    * periodic compaction" — this is the compaction half). Rewrites the
    * KV snapshot keeping only unexpired keys, one row per key (max
    * expires_at wins, the upsert-latest semantic of the KV store it
    * models). Readers are never WRONG without it — TTL is enforced at
    * read time by filterSuspicious — but without it the snapshot grows
    * with every detection forever; compaction bounds its size so the
    * broadcast side of the IP filter stays a broadcast.
    *
    * The expiry predicate is strictly `expires_at > asOf` — the same
    * boundary filterSuspicious applies, so compaction never changes
    * what a reader sees.
    *
    * The rewrite is write-tmp-then-swap: the live set is materialized
    * into a sibling temp dir first, so a crash mid-compaction leaves
    * the old snapshot intact (and a reader never observes a
    * half-written one). Returns the surviving row count. */
  def compactSnapshot(s: SparkSession, snapshotPath: String,
      asOf: Column = current_timestamp()): Long = {
    val p = new org.apache.hadoop.fs.Path(snapshotPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val live = ViewsPipeline.readSnapshotOrEmpty(s, snapshotPath)
      .filter(col("expires_at") > asOf)
      .groupBy(col("user_ip")).agg(max(col("expires_at")).as("expires_at"))
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".compact-${java.util.UUID.randomUUID()}")
    live.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"snapshot swap to $p failed")
    s.read.parquet(snapshotPath).count()
  }
}
