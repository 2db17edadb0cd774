package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q165's per-hour HLL cardinality sketch.
  *
  * No custom state operator is needed: an HLL register is a MAX, max
  * is algebraic, and Spark's watermarked windowed aggregation already
  * maintains per-(window, register) partial maxes whose micro-batch
  * merge IS the HLL union. State per hour is therefore at most 64
  * longs — constant in traffic, the whole point of the sketch — and
  * the append-mode output emits each hour's final registers once the
  * watermark passes the window (ST3's late policy applies to
  * stragglers). The hash pipeline (base-131 fold over the zero-padded
  * key + squaring avalanche, register/rank split) is q153/q165's
  * exact arithmetic, so the finalized registers equal the batch
  * query's registers row for row (proved by replay in StreamHllSpec)
  * and downstream estimate math is shared.
  */
object StreamHll {

  def hourlyRegisters(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame = {
    graft.plans.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .select(col("ts"),
        call_function("rolling_hash",
          lpad(col("user_id").cast("string"), 12, "0")).as("h0"))
      .select(col("ts"), expr("(h0 * h0 + h0) % 1000000007").as("h"))
      .select(window(col("ts"), "1 hour").as("w"),
        (col("h") % 64).as("reg"), expr("h DIV 64").as("rest"))
      .groupBy(col("w"), col("reg"))
      .agg(max(expr(
        "CASE WHEN rest = 0 THEN 25L ELSE CAST(25 - length(bin(rest)) AS BIGINT) END")).as("rho"))
      .select(unix_timestamp(col("w.start")).as("hour_start"),
        col("reg"), col("rho"))
  }
}
