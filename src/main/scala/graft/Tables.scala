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
  /** events.parquet has shipped with two physical encodings for `ts`
    * across driver generations: parquet TIMESTAMP(NANOS) (which Spark's
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong` maps it
    * to a bigint) and native TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which resolves as TIMESTAMP_NTZ). The Glue-crawler contract the
    * reference pins (glue_cf_template.json:90-93, UpdateBehavior=LOG) is
    * "detect drift, don't break" — so this loader adapts to whatever the
    * footer says instead of assuming one frozen encoding, and always
    * yields a session-local TimestampType `ts` (session tz is UTC in
    * every entrypoint, so the NTZ→LTZ cast is value-preserving):
    *   - LongType (nanos-as-long, or a raw bigint fixture): rebuild a
    *     micros timestamp with `DIV 1000` — the data is micro-precision,
    *     so this is lossless and matches what DuckDB (also micros) sees;
    *   - TIMESTAMP_NTZ: cast to TimestampType;
    *   - TimestampType: pass through.
    * The legacy conf is only set when the plain read actually fails on a
    * NANOS column — never as an unconditional session-wide side effect. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw =
      try apply(s, d, "events")
      catch {
        // "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,…))" — only this
        // shape warrants the legacy-conf retry; anything else propagates.
        case e: Exception
            if String.valueOf(e.getMessage).contains("NANOS") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          apply(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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
        // events must go through its encoding-adaptive loader so the
        // view exposes a true TimestampType ts regardless of how the
        // current testdata generation stored it.
        val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
        df.createOrReplaceTempView(n)
      }
      lastRegistered.put(spark, dir)
    }
}
