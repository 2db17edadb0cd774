package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The sorted-merge intersection kernel (plans/SortedIntersectCount,
  * q130's triangle closer) against Spark's own array_intersect on
  * random sorted duplicate-free arrays, through BOTH evaluation paths
  * (whole-stage codegen and interpreted eval), plus null/empty edges.
  */
class SortedIntersectCountSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val sortedSetGen: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)

  test("kernel equals array_intersect size on random sorted sets") {
    check(Prop.forAll(sortedSetGen, sortedSetGen) { (a, b) =>
      graft.plans.SortedIntersectCount.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray)
      ) == a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("expression matches size(array_intersect) in a real plan") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(5L)),
      (Seq(-3L, 0L, 7L, 9L), Seq(-3L, 9L, 11L)))
      .toDF("a", "b")
    val got = rows.select(
      expr("sorted_intersect_count(a, b)").as("k"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    assert(got.collect().forall(r => r.getLong(0) == r.getLong(1)))
    // interpreted path (no codegen) must agree — same kernel by design
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(got.collect().forall(r => r.getLong(0) == r.getLong(1)))
    }
  }

  test("null propagates, arity is analysis-checked") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS k")
      .collect()
    assert(r.head.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array(1L))").collect()
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
