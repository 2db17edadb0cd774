package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  private lazy val skewed = {
    import spark.implicits._
    // one hot key with 10k rows, 50 cold keys with 10 each
    (Seq.fill(10000)("hot") ++ (1 to 50).flatMap(i => Seq.fill(10)(s"k$i")))
      .toDF("key").repartition(8)
  }

  test("salted two-phase count is exact under skew") {
    val plain = skewed.groupBy(col("key")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("key"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 10000L)
  }

  test("salted join plan: shuffled hash on (key, salt), never broadcast") {
    import spark.implicits._
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex.toDF("key", "attr")
    val plan = Skew.saltedJoin(skewed, dim, "key")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"salt bypassed by broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("__salt"), plan)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .toDF("key", "attr")
    val plain = skewed.join(dim, "key").groupBy(col("key"))
      .agg(count(lit(1)).as("n"), first(col("attr")).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "key").groupBy(col("key"))
      .agg(count(lit(1)).as("n"), first(col("attr")).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
