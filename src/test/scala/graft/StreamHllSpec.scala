package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamHll

/** The streaming per-hour HLL registers must equal the batch
  * computation once the watermark closes each window — the register
  * union across out-of-order micro-batches is exactly the max-merge
  * the sketch promises.
  */
class StreamHllSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime
  private def ts(offSec: Long) = new Timestamp(t0 + offSec * 1000)

  // three hours of traffic; hour 1's users arrive split across two
  // micro-batches OUT OF ORDER; user overlap across hours on purpose
  private val batches = Seq(
    (0L until 40L).map(i => (ts(i * 60), i % 20)) ++
      Seq((ts(3700), 100L), (ts(3800), 101L)),
    Seq((ts(3650), 5L), (ts(3900), 20L), (ts(3950), 100L)) ++
      (0L until 30L).map(i => (ts(7300 + i * 10), i % 25)),
    Seq((ts(86400L * 2), 9999L)), // sentinel: closes every real window
    Seq((ts(86400L * 2 + 10), 9999L)))

  test("streaming hourly HLL registers equal the batch registers per closed window") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = StreamHll.hourlyRegisters(events)
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-hll").toString)
      .start()
    try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val sentinelHours = batches.takeRight(2).flatten.map(_._1.getTime / 3600000L * 3600).toSet
    val got = spark.table("hll_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .filterNot { case ((h, _), _) => sentinelHours.contains(h) }
      .toMap

    // batch twin over the same (non-sentinel) rows, same arithmetic
    graft.plans.GraftFunctions.register(spark)
    val expected = batches.flatten.filter(_._2 != 9999L)
      .toDF("ts", "user_id")
      .select((unix_micros(col("ts")).divide(lit(3600000000L))).cast("long")
          .multiply(3600).as("hour_start"),
        call_function("rolling_hash",
          lpad(col("user_id").cast("string"), 12, "0")).as("h0"))
      .select(col("hour_start"), expr("(h0 * h0 + h0) % 1000000007").as("h"))
      .select(col("hour_start"), (col("h") % 64).as("reg"),
        expr("h DIV 64").as("rest"))
      .groupBy(col("hour_start"), col("reg"))
      .agg(max(expr(
        "CASE WHEN rest = 0 THEN 25L ELSE CAST(25 - length(bin(rest)) AS BIGINT) END")).as("rho"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    assert(got == expected, "streaming registers diverge from batch")
    // the out-of-order hour-1 stragglers actually landed in hour 1
    assert(got.keys.map(_._1).toSet.size == 3, "expected three closed hours")
  }
}
