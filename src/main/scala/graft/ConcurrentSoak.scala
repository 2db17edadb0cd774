package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.operators.{Drift, EventsOps, TrainingOps}
import graft.streaming._

/** CONCURRENT streaming soak (VERDICT r15 #5): every kernel is proven
  * alone by its replay spec; production runs many per session, sharing
  * the executor pool and the state store backend. This harness drives
  * SIX kernels concurrently off ONE paced source — the same staged
  * slice-rename pacer PacedReplay uses — and asserts, per kernel, that
  * the MAXIMUM state-store row count observed across every micro-batch
  * stays within the kernel's documented STREAMING.md bound while
  * co-resident:
  *
  *   - StreamCusum / StreamHolt / StreamEwma / StreamDrift: one state
  *     row per live KEY (flatMapGroupsWithState) → ≤ |event types| = 5;
  *   - StreamHll: 64 registers × open windows; windows close at the
  *     watermark and evict a batch later, so the co-residency bound is
  *     64 × (horizon + batch-ingest span) windows — the
  *     `windowAllowance` budget, independent of row count;
  *   - StreamBuckets: |langs| × 3 census rows × open windows — same
  *     budget.
  *
  * The artifacts the train-batch/serve-stream kernels need (CUSUM μ,
  * tercile boundaries, drift reference CDFs) are trained on the SAME
  * generated workload batch-side first — the hand-off under test is the
  * production one. Generation is executor-side range arithmetic
  * (driver memory flat in n); the pacer renames staged slice files, so
  * no bytes flow through the driver.
  *
  * Usage: ConcurrentSoak [nRows] [spanHours]   (default 1e7 rows, 48 h)
  * Prints one JSON line; exits non-zero if any bound is violated or
  * any kernel fails to drain all rows.
  */
object ConcurrentSoak {

  final case class KernelReport(
      name: String, bound: Long, maxStateRows: Long,
      maxStateBytes: Long, inputRows: Long, ok: Boolean)

  final case class Report(
      rows: Long, spanHours: Int, wallSec: Double,
      kernels: Seq[KernelReport]) {
    def allOk: Boolean = kernels.forall(_.ok)
  }

  /** The soak body, callable from the spec at small n.
    *
    * `windowAllowance` is the open-window budget for the two
    * windowed-agg kernels: watermark horizon (2 windows) + the largest
    * event-time span one micro-batch can ingest + one batch of
    * eviction lag. That span is a function of the PACER (slices land
    * on a wall-clock schedule) and of batch duration under co-resident
    * load — independent of row count, which is the bound that matters:
    * at the default 60 s pace over 48 h the full-size run observes
    * 9-10 open windows against the 16 allowed (and against 49 total
    * span windows if nothing ever evicted); the spec's gentler 20 s /
    * 12 h pacing stays inside 8. */
  def run(spark: SparkSession, n: Long, spanHours: Int,
      paceSec: Double = 60.0, baseDir: Option[String] = None,
      windowAllowance: Int = 16): Report = {
    import spark.implicits._
    val types = Seq("view", "click", "purchase", "signup", "error")
    val spanS = spanHours * 3600L
    val start = 1700000000L

    // executor-side workload: n events over spanHours, 5 types, value
    // cents and user ids from id arithmetic (closed-form, replayable)
    def workload: DataFrame = spark.range(n).select(
      timestamp_seconds(lit(start) + col("id") * spanS / n).as("ts"),
      element_at(typedLit(types), (col("id") % 5).cast("int") + 1)
        .as("event_type"),
      (col("id") % 1000L).as("user_id"),
      (col("id") % 997L).as("value"))

    // ---- batch-side artifact training (the production hand-off) ----
    val batch = workload
    val mu = EventsOps.cusumMu(batch).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val thresholds = TrainingOps.tercileThresholds(
      batch.select(col("event_type").as("lang"), col("value").as("lm_score")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("lang", "b1", "b2")
    val refs = Drift.referenceCdfs(
      batch.select(col("event_type").as("source"), col("value")), "value")

    // ---- stage once, pace into ONE shared directory ----------------
    val base = baseDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-csoak").toString)
    val sliceS = math.max(60L, spanS / 128L).toInt
    val staged = PacedReplay.stage(batch, "ts", s"$base/staged", sliceS)
    val inDir = s"$base/in"
    val hadoopIn = new org.apache.hadoop.fs.Path(inDir)
    val fs = hadoopIn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(hadoopIn)

    // ---- the six co-resident kernels --------------------------------
    def src: DataFrame = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", 10000).json(inDir)
    def asDocs(df: DataFrame): DataFrame = df.select(
      col("ts"), col("event_type").as("lang"), col("value").as("lm_score"))
    def asSources(df: DataFrame): DataFrame = df.select(
      col("event_type").as("source"), col("ts"), col("value").as("v"))
    val kernels: Seq[(String, DataFrame, Long)] = Seq(
      ("cusum", StreamCusum.chart(src, mu).toDF, types.size.toLong),
      ("holt", StreamHolt.chart(src).toDF, types.size.toLong),
      ("ewma", StreamEwma.chart(src).toDF, types.size.toLong),
      ("drift", StreamDrift.chart(asSources(src), refs).toDF,
        types.size.toLong),
      ("hll", StreamHll.hourlyRegisters(src), 64L * windowAllowance),
      ("buckets", StreamBuckets.hourlyCensus(asDocs(src), thresholds),
        15L * windowAllowance))

    // ---- telemetry: max state rows/bytes + input rows per query -----
    val maxRows = new ConcurrentHashMap[java.util.UUID, Long]()
    val maxBytes = new ConcurrentHashMap[java.util.UUID, Long]()
    val inRows = new ConcurrentHashMap[java.util.UUID, Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        val bytes = p.stateOperators.map(_.memoryUsedBytes).sum
        maxRows.merge(p.id, rows, math.max(_, _))
        maxBytes.merge(p.id, bytes, math.max(_, _))
        inRows.merge(p.id, p.numInputRows, _ + _)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val t0 = System.currentTimeMillis()
    val queries = kernels.map { case (name, df, _) =>
      name -> df.writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt-$name")
        .queryName(s"csoak-$name")
        .start()
    }
    try {
      // the pacer: rename each staged slice in on the compressed schedule
      val sliceDirs = new java.io.File(staged.dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("slice_dir="))
        .map(f => f.getName.stripPrefix("slice_dir=").toInt -> f)
        .sortBy(_._1)
      val speedup = spanS / paceSec
      val p0 = System.currentTimeMillis()
      sliceDirs.foreach { case (k, dir) =>
        val target = p0 + (k.toLong * sliceS * 1000 / speedup).toLong
        val wait = target - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        dir.listFiles().filter(_.getName.endsWith(".json")).zipWithIndex
          .foreach { case (f, i) =>
            require(fs.rename(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath),
              new org.apache.hadoop.fs.Path(hadoopIn, f"slice-$k%06d-$i.json")),
              s"pacer rename of slice $k failed")
          }
      }
      // drain: every co-resident kernel must consume every staged row
      queries.foreach { case (_, q) => q.processAllAvailable() }
    } finally {
      queries.foreach { case (_, q) => q.stop() }
      spark.streams.removeListener(listener)
    }
    val wallSec = (System.currentTimeMillis() - t0) / 1000.0

    val reports = kernels.zip(queries).map { case ((name, _, bound), (_, q)) =>
      val mr = maxRows.getOrDefault(q.id, 0L)
      val mb = maxBytes.getOrDefault(q.id, 0L)
      val ir = inRows.getOrDefault(q.id, 0L)
      KernelReport(name, bound, mr, mb, ir,
        ok = mr <= bound && ir >= staged.rows)
    }
    Report(staged.rows, spanHours, wallSec, reports)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 10000000L
    val spanHours = if (args.length > 1) args(1).toInt else 48
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      "graft-concurrent-soak")
    spark.sparkContext.setLogLevel("WARN")
    val rep = run(spark, n, spanHours)
    val ks = rep.kernels.map { k =>
      s""""${k.name}":{"bound":${k.bound},"max_state_rows":${k.maxStateRows},""" +
        s""""max_state_mb":${(k.maxStateBytes + (1 << 20) - 1) >> 20},""" +
        s""""input_rows":${k.inputRows},"ok":${k.ok}}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"concurrent_soak","rows":${rep.rows},""" +
        s""""span_hours":${rep.spanHours},"kernels":${rep.kernels.size},""" +
        s""""wall_sec":${rep.wallSec},"rows_per_sec":${(rep.rows / rep.wallSec).toLong},""" +
        s""""per_kernel":$ks,"all_ok":${rep.allOk}}""")
    spark.stop()
    if (!rep.allOk) sys.exit(1)
  }
}
