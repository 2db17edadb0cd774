package graft

import org.apache.spark.sql.functions.col

import graft.operators.TextOps

/** The quantized dyadic log2 behind q256's entropy: its stated error
  * bound (one-sided floor quantization, ≤ log2(65/64) ≈ 22369
  * micro-bits below true log2, never above) must hold
  * over an exhaustive small range and a wide dyadic sweep, it must be
  * exact at powers of two, and it must be monotone — the properties
  * that make a shared-constant "diagnostic log" trustworthy.
  */
class Log2TableSpec extends SparkSpec {

  private val BoundMicro = 22370L // ceil(log2(65/64) * 1e6)

  private def quantized(xs: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    xs.toDF("x")
      .selectExpr("x", s"${TextOps.log2MicroSpark("x")} AS l2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("within 22370 micro-bits below true log2; exact at powers of two; monotone") {
    val xs = (1L to 4096L) ++
      (13 to 56).map(k => 1L << k) ++
      (13 to 56).flatMap(k => Seq((1L << k) - 1, (1L << k) + 1, (1L << k) * 3 / 2))
    val got = quantized(xs.distinct)
    got.foreach { case (x, l2) =>
      val truth = math.log(x.toDouble) / math.log(2.0) * 1e6
      // floor quantization: never above true (+1 micro for table
      // rounding), at most log2(65/64) below
      assert(l2 <= truth + 1 && l2 >= truth - BoundMicro,
        s"x=$x: quantized $l2 vs true ${truth.toLong} (bound $BoundMicro)")
    }
    (0 to 56).foreach { k =>
      val x = 1L << k
      assert(got.getOrElse(x, quantized(Seq(x))(x)) == 1000000L * k,
        s"power of two 2^$k must be exact")
    }
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach { case Seq((xa, la), (xb, lb)) =>
      assert(la <= lb, s"not monotone between $xa and $xb")
    }
  }
}
