package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class SqDistLongSpec extends SparkSpec {

  test("codegen sq_dist_long matches exact integer reference and handles nulls") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val fixtures = Seq(
      (Array(0L, 0L, 0L), Array(0L, 0L, 0L)),
      (Array(10000L, -20000L, 5L), Array(-10000L, 20000L, 5L)),
      (Array(199999L, -199999L), Array(-199999L, 199999L)), // extreme grid values
      (Array(7L), Array(11L)))
    val df = fixtures.toDF("a", "b")
    val got = df.select(call_function("sq_dist_long", col("a"), col("b"))).collect()
      .map(_.getLong(0))
    val expected = fixtures.map { case (a, b) =>
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    }
    assert(got.toSeq == expected)
    val n = df.select(call_function("sq_dist_long",
      lit(null).cast("array<bigint>"), col("b"))).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("two sq_dist_long instances compile in one codegen stage (fresh local names)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val df = Seq((Array(1L, 2L), Array(2L, 1L), Array(3L, 3L))).toDF("a", "b", "c")
      val r = df.select(
        call_function("sq_dist_long", col("a"), col("b")).as("d1"),
        call_function("sq_dist_long", col("a"), col("c")).as("d2")).collect()
      assert(r(0).getLong(0) == 2L && r(0).getLong(1) == 5L)
    }
  }

  test("interpreted eval equals codegen on random long grids") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // transform's lambda body runs sq_dist_long through the eval path
    // (q205's assignment shape); the flat call is codegen'd — both must
    // agree on the same inputs
    val rows = (0 until 50).map { r =>
      (Array.tabulate(16)(i => ((r * 31 + i * 7919) % 400001 - 200000).toLong),
        Array.tabulate(16)(i => ((r * 17 + i * 104729) % 400001 - 200000).toLong))
    }
    val df = rows.toDF("a", "b")
    val viaEval = df
      .select(expr("transform(array(b), y -> sq_dist_long(a, y))[0]").as("d"))
      .collect().map(_.getLong(0))
    val viaCodegen = df
      .select(call_function("sq_dist_long", col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0))
    assert(viaEval.toSeq == viaCodegen.toSeq)
  }
}
