package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("codegen cosine_sim matches a reference computation and handles nulls/zero vectors") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),   // identical -> 1.0
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),   // orthogonal -> 0.0
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f)))   // zero norm -> null
      .toDF("a", "b")
    val r = df.select(call_function("cosine_sim", col("a"), col("b")).as("s")).collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r(1).getDouble(0)) < 1e-12)
    val expected = {
      val (a, b) = (Array(1f, 2f, 3f), Array(4f, 5f, 6f))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    assert(math.abs(r(2).getDouble(0) - expected) < 1e-9)
    assert(r(3).isNullAt(0))
    // null input -> null
    val n = df.select(call_function("cosine_sim", lit(null).cast("array<float>"), col("b"))).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("two cosine_sim instances compile in one codegen stage (fresh local names)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // With fixed local names this stage fails janino compilation
    // ("Redefinition of local variable i") and silently drops to
    // interpreted mode; fallback=false turns that into a hard error.
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val df = Seq((Array(1f, 2f), Array(2f, 1f), Array(1f, 1f))).toDF("a", "b", "c")
      val r = df.select(
        call_function("cosine_sim", col("a"), col("b")).as("s1"),
        call_function("cosine_sim", col("a"), col("c")).as("s2")).collect()
      assert(r(0).getDouble(0) > 0 && r(0).getDouble(1) > 0)
    }
  }

  test("fast KNN agrees with the exact-decimal path on neighbor sets") {
    // q34 is self-validating: n_agree counts its top-5 ids that the
    // exact-decimal q31 ranking also has. Full agreement expected —
    // float error is far below observed score gaps on this data.
    val rows = SparkEntry.queries("q34_knn_codegen")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 10, s"expected 10 query rows, got ${rows.length}")
    rows.foreach { case (qid, nAgree, topIds) =>
      assert(nAgree == 5, s"query $qid agrees on only $nAgree/5: $topIds")
      assert(topIds.split(",").length == 5, s"query $qid top_ids: $topIds")
    }
  }
}
