package graft

import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank must equal the partition-less window row_number it
  * replaces — including under adversarial partitioning and with the
  * checkpoint-backed single execution of the range shuffle (the range
  * sampler is NOT deterministic across plan instantiations; the
  * materialization is what makes the counts branch and the final join
  * agree). */
class DistributedRankSpec extends SparkSpec {

  test("withGlobalRank ≡ row_number over a total order, any input partitioning") {
    import spark.implicits._
    // values with heavy ties so the tiebreaker matters; shuffled and
    // repartitioned adversarially before ranking
    val df = spark.range(10000)
      .select((col("id") * 2654435761L % 97L).as("v"), col("id"))
      .repartition(17, col("id") % 5)
    val got = DistributedRank
      .withGlobalRank(df, Seq(col("v"), col("id")), "rk", "total")
      .select(col("v"), col("id"), col("rk"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = df
      .withColumn("rk", row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("total", count(lit(1)).over(Window.partitionBy()).cast("long"))
      .select(col("v"), col("id"), col("rk"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10000)
    assert(got.sortBy(t => t._3) sameElements want.sortBy(t => t._3))
  }

  test("ranks are a permutation of 1..n and total is exact under repeated runs") {
    // two plan instantiations may draw different range bounds — each
    // run must still be internally consistent
    for (_ <- 1 to 2) {
      val df = spark.range(5000).select((col("id") % 13).as("v"), col("id"))
      val rks = DistributedRank
        .withGlobalRank(df, Seq(col("v"), col("id")), "rk", "total")
        .select(col("rk"), col("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rks.map(_._1).sorted.toSeq == (1L to 5000L))
      assert(rks.forall(_._2 == 5000L))
    }
  }

  test("withGlobalPrefixSum ≡ partition-less cumulative window, any input partitioning") {
    val df = spark.range(10000)
      .select(col("id"), ((col("id") * 2654435761L) % 37L + 1L).as("w"))
      .repartition(13, col("id") % 7)
    val got = DistributedRank
      .withGlobalPrefixSum(df, Seq(col("id")), col("w"), "cum", "total")
      .select(col("id"), col("w"), col("cum"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = df
      .withColumn("cum", sum(col("w")).over(Window.orderBy(col("id"))).cast("long"))
      .withColumn("total", sum(col("w")).over(Window.partitionBy()).cast("long"))
      .select(col("id"), col("w"), col("cum"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 10000)
    assert(got.sortBy(_._1) sameElements want.sortBy(_._1))
    // the dense-bucketed variant must agree too — including on a
    // NON-CONTIGUOUS id domain (gaps skew the arithmetic buckets but
    // must never change the answer)
    val gappy = df.filter(col("id") % 3 =!= 0)
    val gotDense = DistributedRank
      .withGlobalPrefixSumDense(gappy, col("id"), col("w"), "cum", "total")
      .select(col("id"), col("cum"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wantDense = gappy
      .withColumn("cum", sum(col("w")).over(Window.orderBy(col("id"))).cast("long"))
      .withColumn("total", sum(col("w")).over(Window.partitionBy()).cast("long"))
      .select(col("id"), col("cum"), col("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotDense.sortBy(_._1) sameElements wantDense.sortBy(_._1))
  }
}
