package graft

import org.apache.spark.sql.functions._

class ApproxSketchSpec extends SparkSpec {

  test("approx sketches track the exact baselines within tolerance") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q43_approx_sketches")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (u, p50)) =>
      val (au, ap50) = approx(k)
      assert(math.abs(au - u).toDouble / u <= 0.1, s"$k distinct: $au vs $u")
      // p50 within the observed value range and near the exact median
      assert(math.abs(ap50 - p50) / math.max(p50, 1.0) <= 0.2, s"$k p50: $ap50 vs $p50")
    }
  }
}
