package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's canonical config.
  *
  * Design notes (SURVEY.md §4): the reference delegates optimization to
  * managed engines (Athena/EMR Spark); we delegate to Catalyst + AQE and
  * pin only what matters for determinism and local-mode scale:
  *   - UTC session TZ (reference timestamps are second-precision UTC,
  *     reference generator.py:42)
  *   - AQE on: runtime partition coalescing + skew-join splitting (bot
  *     IPs are hot keys — reference generator.py:147-154)
  *   - shuffle.partitions sized for local[32]; on a real cluster this
  *     would be ~2-3x total cores, and AQE coalesces down.
  */
object GraftSession {

  def builder(master: String = "local[*]", appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")

  def create(master: String = "local[*]", appName: String = "graft"): SparkSession = {
    val spark = builder(master, appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
