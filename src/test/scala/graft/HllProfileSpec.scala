package graft

import org.apache.spark.sql.functions._

/** q289's estimate-vs-exact calibration on the fixture (VERDICT r14
  * ask #2: "estimate beside exact"): the exact comparison deliberately
  * lives HERE rather than inside the registered query — an exact
  * distinct inside the approximate profiler would re-buy the q271
  * Expand the query exists to avoid, and the registered plan must keep
  * its flat register-algebra shape. Each column's HLL estimate must
  * land within 3 sigma (3 x 1.04/sqrt(256) = 19.5%) of the true
  * distinct count, with a small-cardinality absolute floor. */
class HllProfileSpec extends SparkSpec {

  private def exactDistincts(dir: String): Map[String, Long] = {
    val ev = Tables.events(spark, dir)
    val r = ev.agg(
      countDistinct(col("event_id")).as("event_id"),
      countDistinct(expr("unix_micros(CAST(ts AS TIMESTAMP))")).as("ts"),
      countDistinct(col("user_id")).as("user_id"),
      countDistinct(col("event_type")).as("event_type"),
      countDistinct(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("value"),
      countDistinct(col("props")).as("props")).collect()(0)
    r.schema.fieldNames.map(f => f -> r.getAs[Long](f)).toMap
  }

  private def checkAt(dir: String): Unit = {
    val got = SparkEntry.queries("q289_hll_column_profile")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val exact = exactDistincts(dir)
    assert(got.keySet == exact.keySet)
    val n = Tables.events(spark, dir).count()
    got.foreach { case (c, (nGot, nNull, est, lo, hi)) =>
      assert(nGot == n && nNull == 0L, s"$c: n=$nGot null=$nNull (corpus n=$n)")
      assert(lo <= est && est <= hi, s"$c: band [$lo,$hi] excludes its own estimate $est")
      val ex = exact(c)
      val tol = math.max(3L, math.ceil(0.195 * ex).toLong) // 3 sigma at m=256
      assert(math.abs(est - ex) <= tol,
        s"$c: estimate $est vs exact $ex (tolerance $tol)")
    }
  }

  test("q289 estimates land within 3 sigma of exact per column (sf0.001)") {
    checkAt(TestSession.sfDir)
  }

  test("q289 estimates land within 3 sigma of exact per column (sf0.01)") {
    checkAt("/root/testdata/sf0.01")
  }
}
