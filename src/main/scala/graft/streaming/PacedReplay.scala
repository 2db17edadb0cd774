package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Event-time-paced stream replay — the engine-side analog of the
  * reference producer's `sleep_until` loop (generator.py:219-221), which
  * delivers each record at its event time. Replays a landed workload
  * through a streaming pipeline at `speedup`× real time and measures
  * END-TO-END latency: object-landed → filtered row durably written.
  *
  * Scale shape: the workload is pre-partitioned into per-slice files by
  * a DISTRIBUTED write (stage()), and the pacer then just RENAMES each
  * slice into the watched directory at its scheduled wall-clock instant
  * — a filesystem metadata op, so no bytes flow through the driver no
  * matter the corpus size. Slices are the event-time granularity
  * (per-record sleep_until degenerates to per-slice sleep_until with
  * sliceSeconds=1 — at millions of rows/hr a per-record pacer would be
  * driver-bound, which is exactly the shape this avoids).
  *
  * Latency is measured per slice (all rows of a slice share an arrival
  * instant, so per-row latency IS per-slice latency) and percentiles are
  * frequency-weighted by slice row count.
  */
object PacedReplay {

  final case class Staged(dir: String, slices: Int, rows: Long, schema: StructType)

  final case class LatencyReport(
      rows: Long, slices: Int, wallSec: Double,
      p50Ms: Long, p95Ms: Long, p99Ms: Long, maxMs: Long)

  /** Distributed staging pass: bucket `events` into event-time slices of
    * `sliceSeconds`, one JSON file per slice (repartition by slice →
    * partitionBy writes exactly one file per slice dir). The `slice`
    * index stays in the row data (slice_dir is the path copy). */
  def stage(events: DataFrame, tsCol: String, stagingDir: String,
      sliceSeconds: Int): Staged = {
    val withTs = events.withColumn("__ts_s", unix_timestamp(col(tsCol)))
    val tMin = withTs.agg(min(col("__ts_s"))).head().getLong(0)
    val sliced = withTs
      .withColumn("slice", ((col("__ts_s") - lit(tMin)) / sliceSeconds).cast("int"))
      .drop("__ts_s")
      .withColumn("slice_dir", col("slice"))
    val toWrite = sliced.repartition(col("slice_dir")).persist()
    toWrite.write.partitionBy("slice_dir").mode("overwrite").json(stagingDir)
    val n = toWrite.count() // counted from the persisted frame the write consumed
    toWrite.unpersist()
    val schema = sliced.drop("slice_dir").schema
    val slices = new java.io.File(stagingDir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("slice_dir="))
    Staged(stagingDir, slices, n, schema)
  }

  /** Run the paced replay: land staged slices into `inDir` on the
    * event-time schedule (compressed by `speedup`), stream them through
    * `transform` (must preserve the `slice` column) into `outDir`, and
    * report landed→written latency percentiles. */
  def replay(s: SparkSession, staged: Staged, inDir: String, outDir: String,
      ckpt: String, sliceSeconds: Int, speedup: Double,
      transform: DataFrame => DataFrame = identity,
      timeoutSec: Int = 300): LatencyReport = {
    require(speedup > 0, "speedup must be positive")
    val hadoopIn = new org.apache.hadoop.fs.Path(inDir)
    val fs = hadoopIn.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(hadoopIn)
    val latDir = s"$outDir-latency"

    val landMs = new ConcurrentHashMap[Int, Long]()
    val processedRows = new AtomicLong(0)

    val stream = s.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", 10000)
      .json(inDir)
    val query = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        transform(batch).write.mode("append").parquet(outDir)
        // stamp AFTER the real sink write is durable — latency covers
        // discovery + filter + write, not just discovery
        val doneMs = System.currentTimeMillis()
        val landSnap = {
          import scala.jdk.CollectionConverters._
          landMs.asScala.toSeq.map { case (k, v) => (k, v) }
        }
        import batch.sparkSession.implicits._
        val landDf = landSnap.toDF("slice", "land_ms")
        val perSlice = batch.groupBy(col("slice")).agg(count(lit(1)).as("n_rows"))
          .join(broadcast(landDf), Seq("slice"))
          .select(col("slice"), col("n_rows"),
            (lit(doneMs) - col("land_ms")).as("latency_ms"))
        perSlice.write.mode("append").parquet(latDir)
        processedRows.addAndGet(batch.count())
        batch.unpersist()
        ()
      }
      .start()

    // the pacer: rename each staged slice in at its scheduled instant
    val t0 = System.currentTimeMillis()
    val sliceDirs = new java.io.File(staged.dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("slice_dir="))
      .map(f => f.getName.stripPrefix("slice_dir=").toInt -> f)
      .sortBy(_._1)
    sliceDirs.foreach { case (k, dir) =>
      val target = t0 + (k.toLong * sliceSeconds * 1000 / speedup).toLong
      val wait = target - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      dir.listFiles().filter(_.getName.endsWith(".json")).zipWithIndex.foreach {
        case (f, i) =>
          require(fs.rename(new org.apache.hadoop.fs.Path(f.getAbsolutePath),
            new org.apache.hadoop.fs.Path(hadoopIn, f"slice-$k%06d-$i.json")),
            s"pacer rename of slice $k failed")
      }
      landMs.put(k, System.currentTimeMillis())
    }

    // drain: all staged rows must clear the sink, then stop
    val deadline = System.currentTimeMillis() + timeoutSec * 1000L
    while (processedRows.get() < staged.rows && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val drained = processedRows.get()
    query.stop()
    query.awaitTermination()
    require(drained >= staged.rows,
      s"paced replay timed out: $drained of ${staged.rows} rows drained")
    val wallSec = (System.currentTimeMillis() - t0) / 1000.0

    val pcts = s.read.parquet(latDir)
      .agg(expr("percentile(latency_ms, array(0.5, 0.95, 0.99), n_rows)").as("p"),
        max(col("latency_ms")).as("mx"))
      .head()
    val p = pcts.getSeq[Double](0)
    LatencyReport(staged.rows, staged.slices, wallSec,
      p(0).toLong, p(1).toLong, p(2).toLong, pcts.getLong(1))
  }
}
