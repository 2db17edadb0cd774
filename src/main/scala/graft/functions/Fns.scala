package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic numeric helpers.
  *
  * The driver's correctness gate hash-compares our results against a
  * DuckDB oracle. Floating-point SUM/AVG are order-dependent, and Spark's
  * parallel partial aggregation visits rows in a different order than
  * DuckDB's scan — so raw `sum(double)` can differ in low-order bits and
  * fail a hash compare even when "equal".
  *
  * Fix: route money/quantity arithmetic through exact decimals. The test
  * data carries at most 2 decimal digits, so DECIMAL(18,2) casts are
  * lossless, decimal add/multiply is exact, the final decimal→double cast is a
  * single deterministic rounding, and both engines produce bit-identical
  * doubles regardless of aggregation order. Same trick the oracle SQL
  * uses on the DuckDB side.
  *
  * At 100 TB this is also the *correct* choice for money columns: exact
  * decimal aggregation stays inside whole-stage codegen and partial
  * aggregation (map-side combine) still applies.
  */
object Fns {

  /** Lossless cast for a ≤`scale`-decimal-digit double column. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Order-independent exact sum, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale)).cast(DoubleType)

  /** Order-independent mean: exact decimal sum, one double division. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast(DoubleType) / count(c)

  /** l_extendedprice * (1 - l_discount), exact. */
  def discPrice(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(DecimalType(18, 2)) - dec(discount))

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exact. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (lit(1).cast(DecimalType(18, 2)) + dec(tax))

  /** Epoch seconds (floor) as bigint — matches DuckDB epoch(ts). */
  def epochS(ts: Column): Column = unix_timestamp(ts)

  /** Epoch microseconds as bigint — matches DuckDB epoch_us(ts). */
  def epochUs(ts: Column): Column = unix_micros(ts)

  /** Epoch-second time bucket: floor(ts to `seconds`) as bigint epoch.
    * One definition for every windowed query — the cast truncates toward
    * zero, which equals DuckDB's `//` floor only for non-negative epochs
    * (all test data is post-1970); if pre-1970 timestamps ever appear,
    * this ONE place changes to floor(). */
  def bucketS(ts: Column, seconds: Long): Column =
    epochS(ts).divide(seconds).cast(org.apache.spark.sql.types.LongType) * seconds
}
