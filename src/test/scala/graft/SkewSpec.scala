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

  test("q270's derived salt closes the loop: audit formula -> parity at that salt") {
    import spark.implicits._
    // the fixture's spectrum: hot key 10000 rows, median key 10 rows ->
    // ratio 1000 -> clamped 256 (the replication-cost cap)
    assert(Skew.recommendedSalt(10000L, 10L) == 256)
    assert(Skew.recommendedSalt(10L, 10L) == 1)     // no skew -> don't salt
    assert(Skew.recommendedSalt(33L, 10L) == 4)     // ceil(3.3) = 4 -> pow2
    assert(Skew.recommendedSalt(40L, 10L) == 4)     // exact power stays
    assert(Skew.recommendedSalt(41L, 10L) == 8)
    // the audit column and the JVM mirror agree on the registered
    // query's own output (same formula, cross-engine-gated by the
    // q270 oracle)
    val audit = SparkEntry.queries("q270_join_skew_audit")(spark, TestSession.sfDir)
      .select(col("relation"), col("max_key_rows"), col("p50_key_rows"),
        col("recommended_salt"))
      .collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getLong(3) == Skew.recommendedSalt(r.getLong(1), r.getLong(2)).toLong,
        s"${r.getString(0)}: audit ${r.getLong(3)} != mirror")
    }
    // parity at the fixture's derived salt (256): the salted operators
    // must be exact at the recommendation, not just at the old default
    val salt = Skew.recommendedSalt(10000L, 10L)
    val plain = skewed.groupBy(col("key")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("key"), salt)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex.toDF("key", "attr")
    val joined = Skew.saltedJoin(skewed, dim, "key", salt).groupBy(col("key"))
      .agg(count(lit(1)).as("n")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(joined == plain)
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
