package graft

import org.apache.spark.sql.functions._

/** The native `zorder2` Expression: bit-exact against the definitional
  * interleave, identical under codegen and interpreted evaluation, and
  * actually delivering the layout property the query claims — bounded
  * per-tile bounding boxes on BOTH dimensions.
  */
class ZOrderSpec extends SparkSpec {

  /** Definitional interleave: bit i of x at 2i, bit i of y at 2i+1. */
  private def ref(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    z
  }

  private def viaSpark(pairs: Seq[(Long, Long)], codegen: Boolean): Seq[Long] = {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val confs: Seq[(String, String)] =
      if (codegen) Seq("spark.sql.codegen.wholeStage" -> "true")
      else Seq("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    withSQLConf(confs: _*) {
      pairs.toDF("x", "y").select(expr("zorder2(x, y)"))
        .collect().toSeq.map(_.getLong(0))
    }
  }

  test("matches the definitional bit interleave (codegen + interpreted)") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (255L, 255L), (0x10000L, 0L), (0xABCDEFL, 0x123456L)) ++
      Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs))
    val want = pairs.map { case (x, y) => ref(x & 0xffffL, y & 0xffffL) }
    for (cg <- Seq(true, false))
      assert(viaSpark(pairs, cg) == want, s"codegen=$cg")
  }

  test("monotone locality: every 4096-code tile bounds both dims to 64") {
    // the layout claim behind q127: contiguous z ranges are small boxes
    val all = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val byTile = all.groupBy { case (x, y) => ZOrder2Ref.tile(ref(x, y)) }
    assert(byTile.size == 16)
    for ((_, cell) <- byTile) {
      val xs = cell.map(_._1); val ys = cell.map(_._2)
      assert(xs.max - xs.min == 63 && ys.max - ys.min == 63)
      assert(cell.size == 4096)
    }
  }

  test("null input yields null; wrong arity is an analysis error") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq((Option.empty[Long], Some(3L))).toDF("x", "y")
      .select(expr("zorder2(x, y)")).collect()(0)
    assert(out.isNullAt(0))
    intercept[Exception] {
      Seq(1L).toDF("x").select(expr("zorder2(x)")).collect()
    }
  }
}

private object ZOrder2Ref {
  def tile(z: Long): Long = z / 4096
}
