package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ApproxSketchSpec extends SparkSpec {

  test("histogram-inversion p40/p60 pick the same element as percentile_disc") {
    // VERDICT r15 #1: q43's exact-percentile baseline moved from an
    // in-aggregate percentile_disc (sort-based agg over every raw value
    // — ×19 superlinear at sf1) to histogram inversion over the value
    // domain. This small-sf witness proves the inversion is the SAME
    // statistic: cum >= ceil(q*n) over the (type, value) histogram
    // selects exactly percentile_disc's element, for both quantiles.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val disc = ev.groupBy(col("event_type")).agg(
        expr("percentile_disc(0.4) WITHIN GROUP (ORDER BY value)").as("p40"),
        expr("percentile_disc(0.6) WITHIN GROUP (ORDER BY value)").as("p60"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val hist = ev.filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wholeW = Window.partitionBy(col("event_type"))
    val inv = hist
      .withColumn("cum", sum(col("cnt")).over(cumW).cast("long"))
      .withColumn("nn", sum(col("cnt")).over(wholeW).cast("long"))
      .groupBy(col("event_type"))
      .agg(min(when(expr("cum >= (2 * nn + 4) DIV 5"), col("value"))).as("p40"),
        min(when(expr("cum >= (3 * nn + 4) DIV 5"), col("value"))).as("p60"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(disc.nonEmpty && disc == inv,
      s"histogram inversion diverged from percentile_disc: $inv vs $disc")
  }

  test("approx sketches track the exact baselines within tolerance") {
    // q43 is self-validating: it emits the exact countDistinct beside
    // boolean verdicts (HLL within 10%, approx p50 within the exact
    // p40..p60 discrete band). The spec asserts every verdict true —
    // the same contract the DuckDB oracle pins at sf0.01.
    val rows = SparkEntry.queries("q43_approx_sketches")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, exactUsers, hllOk, p50Ok, n) =>
      assert(exactUsers > 0 && n > 0, s"$et: degenerate group")
      assert(hllOk, s"$et: HLL estimate drifted >10% from $exactUsers exact")
      assert(p50Ok, s"$et: approx p50 outside the exact p40..p60 band")
    }
  }
}
