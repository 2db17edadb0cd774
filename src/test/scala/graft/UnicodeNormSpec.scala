package graft

import org.apache.spark.sql.functions._

/** The native `nfc_normalize` Expression: canonical composition per
  * UAX #15, identical under codegen and interpreted evaluation, null-
  * and empty-safe, idempotent, and type-checked at analysis time.
  */
class UnicodeNormSpec extends SparkSpec {

  private def nfcOf(raw: String, codegen: Boolean): String = {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val confs: Seq[(String, String)] =
      if (codegen) Seq("spark.sql.codegen.wholeStage" -> "true")
      else Seq("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    withSQLConf(confs: _*) {
      Seq(raw).toDF("s").select(expr("nfc_normalize(s)")).collect()(0).getString(0)
    }
  }

  test("composes decomposed sequences and is idempotent (codegen + interpreted)") {
    val decomposed = "naïve café öö"
    val composed = "naïve café öö"
    for (cg <- Seq(true, false)) {
      assert(nfcOf(decomposed, cg) == composed, s"codegen=$cg")
      assert(nfcOf(composed, cg) == composed, s"idempotence, codegen=$cg")
      assert(nfcOf("", cg) == "")
      assert(nfcOf("plain ascii 123", cg) == "plain ascii 123")
    }
  }

  test("null input yields null, wrong arity and type are analysis errors") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq[Option[String]](None).toDF("s")
      .select(expr("nfc_normalize(s)")).collect()(0)
    assert(out.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT nfc_normalize('a', 'b')").collect()
    }
    intercept[Exception] {
      Seq(1L).toDF("x").select(expr("nfc_normalize(x)")).collect()
    }
  }

  test("agreement with java.text.Normalizer over a generated corpus") {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    // mixed composed/decomposed/combining-run strings from an index
    val rows = (0 until 200).map { i =>
      val parts = Seq("é", "é", "ö", "Å", "x", " ", "ñ", "ñ")
      (0 to i % 7).map(j => parts((i + j) % parts.size)).mkString
    }
    val got = rows.toDF("s").select(expr("nfc_normalize(s)"))
      .collect().map(_.getString(0)).toSeq
    val want = rows.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got == want)
  }
}
