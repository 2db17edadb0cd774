package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drift-proofing for the events loader (round-9 lesson made permanent).
  *
  * The driver's testdata generator has shipped `events.ts` in two
  * different parquet physical encodings across generations — parquet
  * TIMESTAMP(NANOS) (readable only as a nanos bigint under Spark's
  * `nanosAsLong` legacy conf) and native TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (TIMESTAMP_NTZ to Spark). Round 9 hard-coded
  * the first and broke 47 queries when the driver regenerated with the
  * second. The Glue-crawler contract the reference pins
  * (glue_cf_template.json:90-93, UpdateBehavior=LOG) is "detect drift,
  * don't break": this spec writes the same rows in every writable
  * encoding and asserts Tables.events round-trips each to the SAME
  * TimestampType column with the SAME instants.
  */
class EventsEncodingSpec extends SparkSpec {

  // One micro-precision instant plus an exact-second one (catches a
  // loader that truncates or rescales the sub-second part).
  private val micros = Seq(
    1704067200000000L, // 2024-01-01 00:00:00 UTC
    1704067201234567L) // 2024-01-01 00:00:01.234567 UTC

  private def writeEvents(dir: String, tsField: StructField, tsValue: Long => Any): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, tsValue(us), 7L, "view", 0.0, "{}")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"events-enc-$tag").toString

  test("bigint nanos encoding (TIMESTAMP(NANOS) as read under nanosAsLong) round-trips") {
    val dir = tmp("nanos")
    writeEvents(dir, StructField("ts", LongType), us => us * 1000L)
    assert(loadedMicros(dir) == micros)
  }

  test("native micros TIMESTAMP_NTZ encoding (current driver generation) round-trips") {
    val dir = tmp("ntz")
    writeEvents(dir, StructField("ts", TimestampNTZType),
      us => java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    assert(loadedMicros(dir) == micros)
  }

  test("session-tz micros TIMESTAMP_LTZ encoding round-trips") {
    val dir = tmp("ltz")
    withSQLConf("spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS") {
      writeEvents(dir, StructField("ts", TimestampType), us => {
        val t = new Timestamp(us / 1000L)
        t.setNanos((us % 1000000L).toInt * 1000)
        t
      })
    }
    assert(loadedMicros(dir) == micros)
  }

  test("the real driver testdata loads with a TimestampType ts at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = Tables.events(spark, s"/root/testdata/$sf")
      assert(df.schema("ts").dataType == TimestampType, s"$sf ts dtype")
      assert(df.limit(1).count() == 1L, s"$sf readable")
    }
  }
}
