package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Brute-force recomputes of the ML-evaluation tier (q284-q286) from
  * the trained per-doc margins themselves — the same model object the
  * queries score, so any divergence is in the metric math.
  */
class MlEvalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def byName(n: String) = SparkEntry.all.find(_.name == n).get

  private lazy val margins: Seq[(Long, Long)] = // (s, y)
    TrainingOps.perceptronScores(
        Tables.documents(spark, sfDir), Seq("src1", "src2"), 3)
      .select(col("s"), col("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q284 AUC equals the O(n*m) pairwise comparison count") {
    val pos = margins.filter(_._2 == 1L).map(_._1)
    val neg = margins.filter(_._2 == -1L).map(_._1)
    val u2 = pos.map(p => neg.map(n =>
      if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
    val Array(r) = byName("q284_roc_auc").run(spark, sfDir).collect()
    assert(r.getLong(0) == pos.size && r.getLong(1) == neg.size)
    assert(r.getLong(2) == u2, "u2 diverges from the pairwise count")
    assert(r.getLong(3) == 500L * u2 / (pos.size.toLong * neg.size) &&
      r.getLong(4) == 1000L * u2 / (pos.size.toLong * neg.size) - 1000L)
    // a trained separator must rank better than chance on its own data
    assert(r.getLong(3) > 500L, s"AUC ${r.getLong(3)} should beat chance")
  }

  test("q285 reliability census equals a bucket walk; rate rises with margin") {
    def bucket(s: Long): Long = if (s >= 0) s / 8 else -((-s + 7) / 8)
    val exp = margins.groupBy(m => bucket(m._1)).map { case (b, xs) =>
      val np = xs.count(_._2 == 1L).toLong
      val ss = xs.map(_._1).sum
      b -> ((xs.size.toLong, np, 1000L * np / xs.size,
        if (ss >= 0) ss / xs.size else -((-ss) / xs.size)))
    }
    val got = byName("q285_reliability").run(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, "reliability census diverges from the bucket walk")
    // weak-monotonicity signal: the top bucket is purer than the bottom
    val bs = got.keys.toSeq.sorted
    assert(got(bs.last)._3 >= got(bs.head)._3,
      "top margin bucket should be at least as ref-pure as the bottom")
  }

  test("q286 PR curve equals a threshold sweep; endpoints correct") {
    val pos = margins.filter(_._2 == 1L).map(_._1)
    val neg = margins.filter(_._2 == -1L).map(_._1)
    val got = byName("q286_pr_curve").run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val doms = margins.map(_._1).distinct
    assert(got.keySet == doms.toSet, "one row per distinct margin")
    for (t <- doms) {
      val tp = pos.count(_ >= t).toLong
      val fp = neg.count(_ >= t).toLong
      val fn = pos.size - tp
      val exp = (tp, fp, fn,
        1000L * tp / math.max(tp + fp, 1L),
        1000L * tp / math.max(tp + fn, 1L),
        2000L * tp / math.max(2 * tp + fp + fn, 1L))
      assert(got(t) == exp, s"threshold $t")
    }
    // at the minimum threshold everything is kept: recall = 1000
    assert(got(doms.min)._5 == 1000L)
    // recall is non-increasing as the threshold rises
    doms.sorted.map(got(_)._5).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ => ()
    }
  }
}
