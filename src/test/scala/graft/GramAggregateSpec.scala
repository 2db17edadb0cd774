package graft

import org.apache.spark.sql.functions._

/** The native gram_upper TypedImperativeAggregate must be
  * partition-count-invariant (merge is element-wise addition — the
  * "safe on 1000 executors" property), agree with the relational
  * pair-explosion recompute, and behave on the edges (empty input,
  * single row, dimension mismatch).
  */
class GramAggregateSpec extends SparkSpec {

  import spark.implicits._

  private def gram(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    graft.plans.GraftFunctions.register(spark)
    df.agg(call_function("gram_upper", col("vm")).as("g"))
      .collect()(0).getSeq[Long](0).toSeq
  }

  test("matches the relational pair-explosion recompute on real embeddings") {
    graft.plans.GraftFunctions.register(spark)
    val vm = Tables.embeddings(spark, TestSession.sfDir)
      .select(expr(
        "transform(embedding, x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(9,4)) * 10000 AS BIGINT))").as("vm"))
    val viaAgg = gram(vm)
    val viaExplode = vm
      .select(explode(expr(
        """flatten(transform(sequence(0, size(vm) - 2), i ->
          |  transform(sequence(i + 1, size(vm) - 1), j ->
          |    struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
          |           element_at(vm, i + 1) * element_at(vm, j + 1) AS p))))""".stripMargin)).as("s"))
      .groupBy(col("s.i"), col("s.j")).agg(sum(col("s.p")).as("g"))
      .orderBy(col("i"), col("j"))
      .collect().map(_.getLong(2)).toSeq
    assert(viaAgg == viaExplode)
    assert(viaAgg.length == 64 * 63 / 2)
  }

  test("partition-count invariant: 1, 7 and 32 partitions give identical state") {
    val base = Seq.tabulate(500)(r => Seq.tabulate(8)(d => (r * 7 + d * 3 - 10).toLong))
      .toDF("vm")
    val results = Seq(1, 7, 32).map(n => gram(base.repartition(n)))
    assert(results.distinct.size == 1)
    assert(results.head.length == 8 * 7 / 2)
  }

  test("empty input evaluates to an empty array; single row to its own products") {
    val empty = Seq.empty[Seq[Long]].toDF("vm")
    assert(gram(empty).isEmpty)
    val one = Seq(Seq(2L, 3L, 5L)).toDF("vm")
    assert(gram(one) == Seq(6L, 10L, 15L)) // (0,1),(0,2),(1,2)
  }

  test("mixed vector lengths fail loudly, not silently") {
    val bad = Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("vm").repartition(1)
    val e = intercept[Exception] {
      gram(bad)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      String.valueOf(c.getMessage).contains("does not match state")), e.toString)
  }

  private def vecSum(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    graft.plans.GraftFunctions.register(spark)
    df.agg(call_function("vec_sum", col("vm")).as("s"))
      .collect()(0).getSeq[Long](0).toSeq
  }

  test("vec_sum equals per-dim sums and is partition-count invariant") {
    val data = Seq.tabulate(300)(r => Seq.tabulate(6)(d => (r * 11 - d * 5 - 100).toLong))
    val expected = (0 until 6).map(d => data.map(_(d)).sum)
    val results = Seq(1, 5, 32).map(n => vecSum(data.toDF("vm").repartition(n)))
    assert(results.distinct.size == 1)
    assert(results.head == expected)
    assert(vecSum(Seq.empty[Seq[Long]].toDF("vm")).isEmpty)
  }
}
