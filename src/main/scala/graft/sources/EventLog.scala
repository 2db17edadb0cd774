package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources/sinks for the reference's physical layouts (SURVEY.md §2.1/2.2):
  * hourly CSV drops, JSON-lines events, dimension CSVs, spam TSV, and the
  * partitioned curated zone.
  */
object EventLog {

  /** The event-log timestamp format (reference generator.py:42) — the
    * ONE definition shared by the generator (DataGen.TsFormat) and the
    * parser (ViewsPipeline.clean); a drift between the two would
    * silently null every parsed ts. */
  val TsPattern = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** views schema as ingested (all strings — schema-on-read like the
    * reference's Glue DDL, glue_cf_template.json:59-72). */
  val viewsRawSchema: StructType = StructType(Seq(
    StructField("item_id", StringType),
    StructField("ts", StringType),
    StructField("device_type", StringType),
    StructField("device_id", StringType),
    StructField("user_ip", StringType)))

  val reviewsRawSchema: StructType = StructType(viewsRawSchema.fields ++ Seq(
    StructField("review_title", StringType),
    StructField("review_text", StringType),
    StructField("review_stars", IntegerType)))

  /** S1: hourly-partitioned CSV scan — reads `prefix/YYYY/MM/DD/HH.csv`
    * (reference generator.py:244 layout). Partition values are derivable
    * from ts (ViewsPipeline.withPartitionColumns); the glob keeps hour
    * files addressable for incremental high-water-mark scans. */
  def readHourlyCsv(s: SparkSession, prefix: String, schema: StructType = viewsRawSchema): DataFrame =
    s.read.schema(schema).option("header", "true")
      .csv(s"$prefix/*/*/*/*.csv")

  /** K1-compatible writer: one directory per hour (multi-file inside —
    * single-file is a compat mode via coalesce(1), deliberately not the
    * default: it serializes the write). */
  def writeHourlyCsv(df: DataFrame, prefix: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.option("header", "true").mode("overwrite").csv(prefix)
  }

  /** K1 exact-layout writer: land ONE object per hour at
    * `prefix/YYYY/MM/DD/HH.csv` — byte-compatible with the reference
    * layout (generator.py:244), so a reference-layout consumer finds
    * exactly the paths it expects. Input must carry int columns
    * year/month/day/hour (ViewsPipeline.withPartitionColumns derives
    * them from ts); they become path segments, not CSV columns.
    *
    * Scale shape: `repartition(hour cols)` routes each hour to exactly
    * one task, so the write is parallel ACROSS hours while still
    * producing a single file PER hour — no global coalesce(1)
    * serialization. The rename pass is driver-side filesystem metadata
    * (one rename per hour), not data movement. */
  def writeHourlyCsvExact(df: DataFrame, prefix: String): Unit = {
    val partCols = Seq("year", "month", "day", "hour")
    require(partCols.forall(df.columns.contains),
      s"writeHourlyCsvExact needs $partCols columns; got ${df.columns.toSeq}")
    val spark = df.sparkSession
    val base = new org.apache.hadoop.fs.Path(prefix)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(base,
      s".tmp-hourly-${java.util.UUID.randomUUID()}")
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*)
      .option("header", "true").mode("overwrite").csv(tmp.toString)
    try {
      val parts = fs.globStatus(new org.apache.hadoop.fs.Path(tmp,
        "year=*/month=*/day=*/hour=*/part-*.csv"))
      val Seg = """(\w+)=(\d+)""".r
      Option(parts).getOrElse(Array.empty).foreach { st =>
        val vals = st.getPath.toString.split('/').collect {
          case Seg(k, v) if partCols.contains(k) => k -> v.toInt
        }.toMap
        val target = new org.apache.hadoop.fs.Path(base, f"${vals("year")}%04d/${
          vals("month")}%02d/${vals("day")}%02d/${vals("hour")}%02d.csv")
        fs.mkdirs(target.getParent)
        if (fs.exists(target)) fs.delete(target, false) // idempotent re-land
        require(fs.rename(st.getPath, target), s"rename to $target failed")
      }
    } finally fs.delete(tmp, true)
  }

  /** S1 incremental flavor: list the hour entries under the reference
    * layout `prefix/YYYY/MM/DD/HH.csv` and read ONLY those strictly
    * newer than `sinceKey` (yyyyMMddHH). The pruning happens at the
    * FILESYSTEM listing — one metadata glob, no bytes of done hours are
    * read — which is what makes the bookmark job O(new hours) instead of
    * O(history) on a flat CSV lake (hour values live in the path, not in
    * physical partition columns Spark could prune on). */
  def readHourlyCsvSince(s: SparkSession, prefix: String, sinceKey: Option[Long],
      schema: StructType = viewsRawSchema): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(prefix)
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    val all = fs.globStatus(new org.apache.hadoop.fs.Path(s"$prefix/*/*/*/*.csv"))
    // Only strictly-conforming zero-padded components are hour data
    // (generator.py:244 writes %04d/%02d/%02d/%02d): an unguarded toLong
    // would crash on a stray notes.csv, and an unpadded segment would
    // parse to a tiny key and be silently "already processed". Anything
    // non-conforming is skipped loudly.
    val HourPath = """(\d{4})/(\d{2})/(\d{2})/(\d{2})\.csv$""".r.unanchored
    val fresh = Option(all).getOrElse(Array.empty).map(_.getPath).filter { p =>
      p.toString match {
        case HourPath(yyyy, mm, dd, hh) =>
          sinceKey.forall(s"$yyyy$mm$dd$hh".toLong > _)
        case _ =>
          System.err.println(s"[readHourlyCsvSince] skipping non-hour entry $p")
          false
      }
    }
    if (fresh.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      s.read.schema(schema).option("header", "true").csv(fresh.map(_.toString).toIndexedSeq: _*)
  }

  /** S2/S3: JSON-lines scan (batch flavor; the streaming twin is
    * Streams.viewsStream). */
  def readJsonLines(s: SparkSession, path: String, schema: StructType = viewsRawSchema): DataFrame =
    s.read.schema(schema).json(path)

  /** S4: items dimension CSV (with header, generator.py:110-114). */
  def readItemsCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").csv(path)

  /** S5: users dimension CSV (no header, generator.py:100-107). */
  def readUsersCsv(s: SparkSession, path: String): DataFrame =
    s.read.schema(StructType(Seq(
        StructField("user_ip", StringType),
        StructField("device_type", StringType),
        StructField("device_id", StringType),
        StructField("is_bot", StringType))))
      .csv(path)

  /** S8: labeled spam corpus TSV `label\ttext` (generator.py:45-68). */
  def readSpamTsv(s: SparkSession, path: String): DataFrame =
    s.read.option("sep", "\t")
      .schema(StructType(Seq(
        StructField("label", StringType), StructField("text", StringType))))
      .csv(path)

  /** K6: curated-zone write, hour-partitioned. Parquet by default; ORC
    * supported for lakes standardized on it (both get predicate pushdown
    * + vectorized reads from Spark). */
  def writeCurated(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite")
      .partitionBy("year", "month", "day", "hour")
      .format(format)
      .save(path)
}
