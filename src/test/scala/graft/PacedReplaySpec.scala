package graft

import java.nio.file.Files

import graft.streaming.PacedReplay
import org.apache.spark.sql.functions._

/** Event-time-paced replay: staging slices the workload correctly, the
  * pacer lands slices on schedule, and the latency report is coherent
  * (all rows drained, non-negative percentiles, ordered p50<=p95<=max).
  */
class PacedReplaySpec extends SparkSpec {

  test("staging buckets rows into event-time slices, one file per slice") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-paced-stage").toString
    // 120s of events, 30s slices -> 4 slices
    val events = (0 until 240)
      .map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i * 500L)))
      .toDF("id", "ts")
    val staged = PacedReplay.stage(events, "ts", s"$base/staged", sliceSeconds = 30)
    assert(staged.slices == 4)
    assert(staged.rows == 240)
    val d = new java.io.File(s"$base/staged")
    val sliceDirs = d.listFiles().filter(_.getName.startsWith("slice_dir="))
    assert(sliceDirs.length == 4)
    sliceDirs.foreach { sd =>
      assert(sd.listFiles().count(_.getName.endsWith(".json")) == 1,
        s"expected one file in $sd")
    }
  }

  test("paced replay drains everything and reports coherent latency percentiles") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-paced").toString
    val events = (0 until 400)
      .map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + i * 300L),
        if (i % 4 == 0) "drop" else "keep"))
      .toDF("id", "ts", "tag")
    // 120s span, 30s slices, 60x speedup -> ~2s of wall pacing
    val staged = PacedReplay.stage(events, "ts", s"$base/staged", sliceSeconds = 30)
    val rep = PacedReplay.replay(spark, staged,
      s"$base/in", s"$base/out", s"$base/ckpt",
      sliceSeconds = 30, speedup = 60.0,
      transform = _.filter(col("tag") =!= "drop"),
      timeoutSec = 120)
    assert(rep.rows == 400 && rep.slices == 4)
    assert(rep.p50Ms >= 0 && rep.p50Ms <= rep.p95Ms && rep.p95Ms <= rep.maxMs)
    // pacing stretched the run to at least the last slice's offset
    assert(rep.wallSec >= (3 * 30) / 60.0, s"wall ${rep.wallSec}s — pacer did not pace")
    // the real sink got exactly the transformed rows
    assert(spark.read.parquet(s"$base/out").count() == 300)
    // latency sink covers every slice
    assert(spark.read.parquet(s"$base/out-latency")
      .select("slice").distinct().count() == 4)
  }
}
