package graft

class ApproxSketchSpec extends SparkSpec {

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
