package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental batch processing — the Glue job-bookmark analog
  * (reference glue_cf_template.json:139 "job-bookmark-enable"): process
  * only hour partitions newer than a persisted high-water mark, so
  * re-runs never reprocess (SURVEY.md §4 "Incremental scan /
  * no-reprocess").
  *
  * The mark is a single (year,month,day,hour) tuple persisted as JSON
  * next to the output; at 100 TB this predicate is a partition-pruning
  * filter — Spark never lists or reads the already-done hours.
  */
object IncrementalScan {

  /** Hour key encoded sortable: yyyyMMddHH as long. */
  private def hourKey = (col("year") * 1000000 + col("month") * 10000 +
    col("day") * 100 + col("hour")).cast("long")

  def readMark(s: SparkSession, markPath: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(markPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes()).trim.toLong)
      finally in.close()
    }
  }

  def writeMark(s: SparkSession, markPath: String, mark: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(markPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mark.toString.getBytes)
    finally out.close()
  }

  /** Rows of `partitioned` (must carry year/month/day/hour columns)
    * strictly newer than the persisted mark. The filter is on partition
    * columns only → partition pruning, no data read for done hours. */
  def newSince(partitioned: DataFrame, mark: Option[Long]): DataFrame =
    mark.fold(partitioned)(m => partitioned.filter(hourKey > m))

  /** One incremental step: read the new hours, apply `job`, append to
    * the curated zone, advance the mark. Returns rows processed.
    *
    * The input is persisted for the duration of the step so the mark,
    * the written rows, and the returned count all come from ONE snapshot
    * of the (possibly live) ingest directory — with separate lazy
    * evaluations, an hour file landing mid-step would be written but not
    * covered by the advanced mark and re-appended (duplicated) by the
    * next run. */
  def step(s: SparkSession, partitioned: DataFrame, markPath: String,
      job: DataFrame => DataFrame, outPath: String): Long = {
    val fresh = newSince(partitioned, readMark(s, markPath)).persist()
    try {
      val head = fresh.agg(max(hourKey), count(lit(1))).head()
      if (head.isNullAt(0)) 0L
      else {
        job(fresh).write.mode("append")
          .partitionBy("year", "month", "day", "hour").parquet(outPath)
        writeMark(s, markPath, head.getLong(0))
        head.getLong(1)
      }
    } finally {
      fresh.unpersist(false)
      ()
    }
  }
}
