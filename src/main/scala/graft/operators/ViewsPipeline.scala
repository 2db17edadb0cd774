package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's views pipeline as reusable batch/stream operators
  * (reference diagram.svg:3): event cleanup → bot detection → suspicious
  * KV snapshot with TTL → IP filter → enrichment → popularity/traffic
  * aggregates.
  *
  * Every function takes/returns DataFrames so the same code runs under
  * `read` (batch) and `readStream` (streaming) — the property the
  * reference needs from its Glue-batch + Lambda-stream duplication
  * (SURVEY.md §3.4).
  */
object ViewsPipeline {

  val TsPattern: String = graft.sources.EventLog.TsPattern

  /** F3/F4/F8: parse ISO ts, normalize "NULL" sentinel, cast ids.
    * Keeps raw columns out; emits typed event rows. */
  def clean(raw: DataFrame): DataFrame =
    raw
      .withColumn("ts", to_timestamp(col("ts"), TsPattern))
      .withColumn("device_id",
        when(col("device_id") === "NULL", lit(null)).otherwise(col("device_id")).cast("int"))
      .withColumn("item_id", col("item_id").cast("int"))

  /** F5: derive the reference's hourly partition columns from ts
    * (reference generator.py:244 path layout). */
  def withPartitionColumns(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))

  /** A1: per-(user, hour) event counts → users whose peak rate is
    * bot-like. Partial aggregation absorbs the bot hot keys (10x rows
    * map-combine into one row per partition). */
  def suspiciousByRate(events: DataFrame, maxHumanPerHour: Int = 1000): DataFrame =
    events
      // clean() nulls unparseable timestamps; without this filter every
      // null-ts row of an IP lands in ONE null-window group, so enough
      // malformed rows over any time span would flag a legitimate user
      .filter(col("ts").isNotNull)
      .groupBy(col("user_ip"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > maxHumanPerHour)
      .select(col("user_ip")).distinct()

  /** W3: inter-arrival signature — bots burst at ~16ms, humans are
    * >=3.6s apart (reference generator.py:126,147-150). One shuffle+sort
    * per user partition. minGapMs must sit between the two modes. */
  def suspiciousByGap(events: DataFrame, minGapMs: Long = 1000): DataFrame = {
    val w = Window.partitionBy(col("user_ip")).orderBy(col("ts"))
    events
      .withColumn("gap_ms",
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)) / 1000)
      .filter(col("gap_ms").isNotNull)
      .groupBy(col("user_ip"))
      // bots: majority of gaps are sub-second. Use min gap: humans never
      // go below 3.6s at reference distributions.
      .agg(min(col("gap_ms")).as("min_gap_ms"))
      .filter(col("min_gap_ms") < minGapMs)
      .select(col("user_ip"))
  }

  /** The suspicious-IP batch job (diagram.svg:3 "Batch Job to find out
    * suspicious IPs"): rate OR gap signal. */
  def detectSuspicious(events: DataFrame, maxHumanPerHour: Int = 1000,
      minGapMs: Long = 1000): DataFrame =
    suspiciousByRate(events, maxHumanPerHour)
      .union(suspiciousByGap(events, minGapMs))
      .distinct()

  /** Load the suspicious-IP snapshot, or an empty deny set when none has
    * been written yet (bootstrap). The missing-path case is detected by
    * an explicit existence check — a blanket catch would also swallow
    * transient read failures (throttling, corrupt footer) and silently
    * let bot traffic through as "nothing suspicious". Real read errors
    * propagate and fail the job/batch, which retries. */
  def readSnapshotOrEmpty(s: org.apache.spark.sql.SparkSession, snapshotPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(snapshotPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(snapshotPath)
    else {
      import s.implicits._
      Seq.empty[(String, java.sql.Timestamp)].toDF("user_ip", "expires_at")
    }
  }

  /** K4: turn a detected-IP set into the KV snapshot with TTL
    * (reference DynamoDB TTL semantics → (user_ip, expires_at)). */
  def suspiciousSnapshot(detected: DataFrame, detectedAt: Column, ttlHours: Int = 24): DataFrame =
    detected.select(col("user_ip"),
      (detectedAt + expr(s"INTERVAL $ttlHours HOURS")).as("expires_at"))

  /** F1+F2/J2: drop events from currently-suspicious IPs. TTL is a
    * read-time predicate on the snapshot; the snapshot side is tiny so
    * it broadcasts — the fact side never shuffles. */
  def filterSuspicious(events: DataFrame, snapshot: DataFrame, asOf: Column): DataFrame = {
    val live = snapshot.filter(col("expires_at") > asOf).select(col("user_ip"))
    events.join(broadcast(live), Seq("user_ip"), "left_anti")
  }

  /** J1: enrich with item dims (broadcast — 100 rows in the reference).
    * INNER join by design: an event whose item_id is missing from the
    * dim cannot contribute to the category aggregates downstream (A3).
    * Operationally this means a stale/incomplete dim silently drops
    * those facts — monitor the match rate, or pass a left-joined frame
    * when unmatched facts must survive. */
  def enrich(events: DataFrame, items: DataFrame): DataFrame =
    events.join(broadcast(items), Seq("item_id"))

  /** A2/A3+W2: most-popular keys per time window, top-k by rank with
    * deterministic tiebreak. */
  def popularTopK(events: DataFrame, keyCol: String, windowDur: String, k: Int): DataFrame = {
    val counts = events
      .groupBy(window(col("ts"), windowDur).as("w"), col(keyCol))
      .agg(count(lit(1)).as("c"))
    val rw = Window.partitionBy(col("w")).orderBy(col("c").desc, col(keyCol))
    counts.withColumn("rk", rank().over(rw)).filter(col("rk") <= k)
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(keyCol), col("c"), col("rk"))
  }

  /** A4: windows whose total traffic exceeds a threshold → K5 alerts. */
  def highTraffic(events: DataFrame, windowDur: String, threshold: Long): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > threshold)
      .select(col("w.start").as("window_start"), col("c"))
}
