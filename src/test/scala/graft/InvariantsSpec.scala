package graft

import graft.operators.BotStatsAggregator
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the invariants that make operators safe under
  * DISTRIBUTED execution: arbitrary input order, arbitrary partition
  * boundaries, arbitrary merge trees. A local run can mask a broken
  * merge; these properties cannot.
  */
class InvariantsSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("BotStatsAggregator: count/span exact, min-gap never underestimates, " +
    "for any input order and any partitioning") {
    val a = BotStatsAggregator.agg
    val genTimes = Gen.nonEmptyListOf(Gen.chooseNum(0L, 10_000_000L))
    val genSeed = Gen.chooseNum(0L, Long.MaxValue)
    check(Prop.forAll(genTimes, genSeed) { (times, seed) =>
      val rnd = new scala.util.Random(seed)
      // random event order, random contiguous partition split, then a
      // left fold of merges (any merge tree reduces to folds of these)
      val shuffled = rnd.shuffle(times)
      val nParts = 1 + rnd.nextInt(math.min(8, shuffled.size))
      val parts = shuffled.grouped(math.ceil(shuffled.size.toDouble / nParts).toInt).toSeq
      val bufs = parts.map(_.foldLeft(a.zero)(a.reduce))
      val out = a.finish(rnd.shuffle(bufs).reduce(a.merge))

      val sorted = times.sorted
      val trueMinGap =
        if (sorted.size < 2) Long.MaxValue
        else sorted.sliding(2).map { case Seq(x, y) => y - x }.min
      Prop.propBoolean(out.n == times.size) :| s"count ${out.n}" &&
        Prop.propBoolean(out.spanUs ==
          (if (times.size <= 1) 0L else sorted.last - sorted.head)) :| "span" &&
        Prop.propBoolean(out.minGapUsUpperBound >= trueMinGap) :|
        s"gap ${out.minGapUsUpperBound} < $trueMinGap"
    })
  }

  test("exact-decimal sum is bit-identical under any partitioning and order") {
    import org.apache.spark.sql.functions._
    import graft.functions.Fns.dsum
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(5000)(math.round(rnd.nextDouble() * 1e6) / 100.0)
    import spark.implicits._
    def total(parts: Int, shuffle: Int): Double = {
      val df = values.toDF("v").repartition(parts)
      withSQLConf("spark.sql.shuffle.partitions" -> shuffle.toString) {
        df.agg(dsum(col("v")).as("s")).collect()(0).getDouble(0)
      }
    }
    val expected = values.map(BigDecimal(_).setScale(2)).sum.toDouble
    assert(total(1, 1) == expected)
    assert(java.lang.Double.doubleToLongBits(total(1, 1)) ==
      java.lang.Double.doubleToLongBits(total(17, 5)))
    assert(java.lang.Double.doubleToLongBits(total(3, 32)) ==
      java.lang.Double.doubleToLongBits(total(29, 2)))
  }

  test("representative queries are result-identical under different parallelism") {
    // Queries chosen to cover the risky shapes: decimal agg (q1), rank
    // tie-break (q8), float fold (q54), max_by tie-break (q58), grouping
    // sets (q47), simhash bit math (q30). Cached-lineage queries
    // (q28/q29/q63) are excluded — their cache would defeat the point.
    val names = Seq("q1_pricing_summary", "q8_topk_per_group", "q54_array_hof",
      "q58_argmax", "q47_grouping_sets", "q30_simhash")
    val dir = "/root/testdata/sf0.001"
    for (name <- names) {
      def run(shuffle: String, maxPartBytes: String): Seq[String] =
        withSQLConf(
          "spark.sql.shuffle.partitions" -> shuffle,
          "spark.sql.files.maxPartitionBytes" -> maxPartBytes) {
          SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
        }
      val a = run("32", "128m")
      val b = run("5", "64k") // many input splits, few reducers
      assert(a == b, s"$name differs between parallelism configs")
    }
  }
}
