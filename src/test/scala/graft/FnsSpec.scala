package graft

import graft.functions.Fns
import org.apache.spark.sql.functions._
import scala.util.Random

class FnsSpec extends SparkSpec {

  test("dsum is exact and order-independent for 2-decimal inputs") {
    import spark.implicits._
    val rnd = new Random(42)
    (1 to 3).foreach { _ =>
      val cents = Seq.fill(500)(rnd.between(-10000000L, 10000000L))
      val doubles = cents.map(_ / 100.0)
      val expected = (BigDecimal(cents.sum) / 100).toDouble
      // different partitionings must not change the result
      Seq(1, 7, 32).foreach { p =>
        val got = doubles.toDF("x").repartition(p)
          .agg(Fns.dsum(col("x")).as("s")).head().getDouble(0)
        assert(got == expected, s"partitions=$p")
      }
    }
  }

  test("epoch helpers floor to seconds/micros like the oracle") {
    import spark.implicits._
    val df = Seq("2024-01-01 00:00:01.999999").toDF("s")
      .withColumn("ts", col("s").cast("timestamp"))
    val r = df.select(Fns.epochS(col("ts")), Fns.epochUs(col("ts"))).head()
    assert(r.getLong(0) == 1704067201L)
    assert(r.getLong(1) == 1704067201999999L)
  }

  test("discPrice/charge are exact decimal money math") {
    import spark.implicits._
    val df = Seq((100.10, 0.05, 0.08)).toDF("p", "d", "t")
    val r = df.select(
      sum(Fns.discPrice(col("p"), col("d"))).cast("double").as("dp"),
      sum(Fns.charge(col("p"), col("d"), col("t"))).cast("double").as("ch")).head()
    assert(r.getDouble(0) == 95.095)
    assert(math.abs(r.getDouble(1) - 102.7026) < 1e-9)
  }
}
