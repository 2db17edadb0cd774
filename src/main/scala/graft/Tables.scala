package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory and read
  * `$dir/<table>.parquet`. Parquet scans get vectorized reads, predicate
  * pushdown and column pruning from Spark for free — queries must keep
  * their filters/projections declarative so they reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default (micros is Spark's native precision). Read
    * nanos as long and rebuild a micros timestamp with integer division —
    * the data is micro-precision, so this is lossless and matches what
    * DuckDB (also micros) sees. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view (≈ the reference's Glue catalog
    * tier, SURVEY.md §3.3) so `spark.sql` works against bare names.
    * The view namespace is session-GLOBAL, so memoization must track the
    * last dir registered per session — a per-(session, dir) memo would
    * skip re-registration after another dir overwrote the views,
    * silently serving that other dir's data. Keyed by the session OBJECT
    * (weakly, so dead sessions evict); a lost race between two callers
    * just re-registers the same views, which is idempotent, so no lock
    * is held across the ten footer reads. */
  private val lastRegistered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (lastRegistered.get(spark) != dir) {
      names.foreach { n =>
        // events must go through its nanos-aware loader — a raw read
        // fails on TIMESTAMP(NANOS) unless some earlier query happened
        // to set the legacy conf (an ordering dependency we don't want),
        // and the view should expose a true timestamp anyway.
        val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
        df.createOrReplaceTempView(n)
      }
      lastRegistered.put(spark, dir)
    }
}
