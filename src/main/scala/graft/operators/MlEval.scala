package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ML-evaluation tier — the metrics every deployed classifier gate is
  * judged by, computed EXACTLY over q246's trained perceptron margins
  * (both engines derive identical weights, so the evaluated model is
  * bit-identical): ROC-AUC via rank statistics, the reliability
  * (calibration) census, and the full precision/recall/F1 curve.
  *
  * The shared trick is the one the drift tier (q273/q274) established:
  * scores collapse to a per-label HISTOGRAM over the integer margin
  * domain first (map-side combine, state bounded by distinct margins),
  * CDFs run as label-partitioned windows (PlanGuard-safe — never a
  * partition-less window), and every metric is integer arithmetic on
  * that census. A 100-TB corpus changes only the first aggregate.
  */
object MlEval {

  /** Per-label margin histogram with label-partitioned cumulative
    * counts and broadcast label totals: (s, y, c, cum, n_pos, n_neg).
    * The shared stage under q284/q285/q286. */
  private def marginGrid(s: SparkSession, dir: String): DataFrame = {
    val scores = TrainingOps.trainedScores(s, dir)
    val hist = scores.groupBy(col("s"), col("y"))
      .agg(count(lit(1)).cast("bigint").as("c"))
      .transform(graft.Graft.stagedCheckpoint) // grid + totals below
    val tot = hist.groupBy(col("y")).agg(sum(col("c")).cast("bigint").as("n"))
    val dom = hist.select(col("s")).distinct()
    val labels = hist.sparkSession.range(2)
      .select((col("id") * 2 - 1).cast("long").as("y"))
    dom.crossJoin(broadcast(labels))
      .join(hist, Seq("s", "y"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("y")).orderBy(col("s")))
          .cast("bigint"))
      .join(broadcast(tot.groupBy().pivot("y", Seq(1L, -1L)).sum("n")
        .select(coalesce(col("1"), lit(0L)).as("n_pos"),
          coalesce(col("-1"), lit(0L)).as("n_neg"))))
  }

  /** The q284–q286 DuckDB CTE suffix building the same grid on top of
    * [[TrainingOps.perceptronOracleCtes]]'s `sf` + `y`. */
  private def duckGrid: String =
    """sc AS (SELECT sf.doc_id, sf.s, y.y FROM sf JOIN y USING (doc_id)),
      |hist AS (SELECT s, y, count(*)::BIGINT AS c FROM sc GROUP BY 1, 2),
      |tot AS (SELECT
      |    CAST(COALESCE(sum(CASE WHEN y = 1 THEN c END), 0) AS BIGINT) AS n_pos,
      |    CAST(COALESCE(sum(CASE WHEN y = -1 THEN c END), 0) AS BIGINT) AS n_neg
      |  FROM hist),
      |dom AS (SELECT DISTINCT s FROM hist),
      |lab AS (SELECT unnest([CAST(1 AS BIGINT), -1]) AS y),
      |g AS (SELECT dom.s, lab.y, COALESCE(hist.c, 0) AS c
      |      FROM dom CROSS JOIN lab
      |      LEFT JOIN hist ON hist.s = dom.s AND hist.y = lab.y),
      |cg AS (SELECT s, y, c,
      |        CAST(sum(c) OVER (PARTITION BY y ORDER BY s) AS BIGINT) AS cum
      |       FROM g)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    q("q284_roc_auc",
      """EXACT ROC-AUC of the q246 quality classifier (Hanley & McNeil
        |1982's identity AUC = U/(n1*n0); Fawcett 2006) — the
        |probability a random ref-corpus doc outscores a random
        |non-ref doc, ties at half credit, computed as q274's
        |Mann-Whitney rank statistic over the margin histogram:
        |u2 = 2*U = sum_s c_pos(s) * (2*cumlt_neg(s) + c_neg(s)), so
        |auc_pm = (500*u2) // (n_pos*n_neg) is exact integer permille,
        |and gini_pm = 2*AUC - 1 rides the same u2. The number every
        |selection-gate review asks for first — q246's census says how
        |many docs the gate keeps, this says how well it RANKS.
        |Scale shape: scores collapse to a (margin, label) histogram
        |with map-side combine; one label-partitioned window; 1-row
        |output. u2 <= 2*n_pos*n_neg bounds BIGINT to ~2e9 docs per
        |class before DECIMAL widening.""".stripMargin,
      s"""WITH ${TrainingOps.perceptronOracleCtes},
        |$duckGrid,
        |u AS (SELECT CAST(sum(p.c * (2 * (n.cum - n.c) + n.c)) AS BIGINT) AS u2
        |      FROM cg p JOIN cg n ON p.s = n.s AND p.y = 1 AND n.y = -1)
        |SELECT tot.n_pos, tot.n_neg, u.u2,
        |  CAST((500 * u.u2) // greatest(tot.n_pos * tot.n_neg, 1) AS BIGINT)
        |    AS auc_pm,
        |  CAST((1000 * u.u2) // greatest(tot.n_pos * tot.n_neg, 1) - 1000
        |    AS BIGINT) AS gini_pm
        |FROM u, tot""".stripMargin) { (s, dir) =>
      val grid = marginGrid(s, dir)
        .transform(graft.Graft.stagedCheckpoint) // p x n self-join
      val p = grid.filter(col("y") === 1L)
        .select(col("s"), col("c").as("cp"), col("n_pos"), col("n_neg"))
      val n = grid.filter(col("y") === -1L)
        .select(col("s"), col("c").as("cn"), col("cum").as("cumn"))
      p.join(n, Seq("s"))
        .groupBy(col("n_pos"), col("n_neg"))
        .agg(sum(col("cp") * (lit(2L) * (col("cumn") - col("cn")) + col("cn")))
          .cast("bigint").as("u2"))
        .select(col("n_pos"), col("n_neg"), col("u2"),
          expr("CAST((500 * u2) DIV greatest(n_pos * n_neg, 1) AS BIGINT)")
            .as("auc_pm"),
          expr("CAST((1000 * u2) DIV greatest(n_pos * n_neg, 1) - 1000 AS BIGINT)")
            .as("gini_pm"))
    },

    // ------------------------------------------------------------------
    q("q285_reliability",
      """Reliability (calibration) census of the q246 classifier
        |(DeGroot & Fienberg 1983; Niculescu-Mizil & Caruana 2005):
        |margins bucket by a width-8 integer shift (row-local, no
        |quantile pass — the q277 discipline) and each bucket reports
        |how often its docs are ACTUALLY ref-corpus: n_docs, n_pos,
        |pos_rate_pm, and the exact mean margin (sign-symmetric DIV
        |via the magnitude split so Spark's truncation and DuckDB's
        |BIGINT truncation agree on negative buckets). A monotone
        |pos_rate over buckets is what "higher margin = more
        |ref-like" means operationally; a flat or folded curve says
        |the gate's threshold is arbitrary — the q284 AUC's pointwise
        |complement. Scale shape: ONE (bucket)-keyed aggregate with
        |map-side combine over the scores; output is bucket-count
        |rows.""".stripMargin,
      s"""WITH ${TrainingOps.perceptronOracleCtes},
        |sc AS (SELECT sf.doc_id, sf.s, y.y FROM sf JOIN y USING (doc_id)),
        |b AS (SELECT CASE WHEN s >= 0 THEN s // 8
        |             ELSE -((-s + 7) // 8) END AS bucket, s, y FROM sc)
        |SELECT bucket, count(*)::BIGINT AS n_docs,
        |  CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST((1000 * sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)) // count(*)
        |    AS BIGINT) AS pos_rate_pm,
        |  CAST(CASE WHEN sum(s) >= 0 THEN sum(s) // count(*)
        |       ELSE -((-sum(s)) // count(*)) END AS BIGINT) AS mean_margin
        |FROM b GROUP BY 1""".stripMargin) { (s, dir) =>
      TrainingOps.trainedScores(s, dir)
        .withColumn("bucket",
          expr("CASE WHEN s >= 0 THEN s DIV 8 ELSE -((-s + 7) DIV 8) END"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(when(col("y") === 1L, 1L).otherwise(0L)).cast("bigint").as("n_pos"),
          expr("""CAST((1000 * sum(CASE WHEN y = 1 THEN 1 ELSE 0 END))
                 |DIV count(1) AS BIGINT)""".stripMargin).as("pos_rate_pm"),
          expr("""CAST(CASE WHEN sum(s) >= 0 THEN sum(s) DIV count(1)
                 |ELSE -((-sum(s)) DIV count(1)) END AS BIGINT)""".stripMargin)
            .as("mean_margin"))
    },

    // ------------------------------------------------------------------
    q("q286_pr_curve",
      """Full precision-recall curve of the q246 classifier (Davis &
        |Goadrich 2006; the Fawcett 2006 threshold sweep): one row per
        |DISTINCT margin threshold t with the confusion counts for the
        |rule "keep if s >= t" — tp = n_pos - cumlt_pos(t), fp =
        |n_neg - cumlt_neg(t) — and exact integer permille precision,
        |recall, and F1 (2*tp*1000 // (2*tp + fp + fn): the harmonic
        |mean cross-multiplied, no fraction materializes). The curve
        |an operator reads to PICK q246's threshold; q284 integrates
        |it to one number.
        |Scale shape: identical to q284's grid — the label-partitioned
        |CDF windows give cumlt per threshold with NO partition-less
        |window (the PR sweep's textbook form sorts all scores
        |globally; the per-label grid join is the distributed
        |reformulation); output is |distinct margins| rows.""".stripMargin,
      s"""WITH ${TrainingOps.perceptronOracleCtes},
        |$duckGrid
        |SELECT p.s AS thresh,
        |  tot.n_pos - (p.cum - p.c) AS tp,
        |  tot.n_neg - (n.cum - n.c) AS fp,
        |  (p.cum - p.c) AS fn,
        |  CAST((1000 * (tot.n_pos - (p.cum - p.c)))
        |    // greatest((tot.n_pos - (p.cum - p.c))
        |             + (tot.n_neg - (n.cum - n.c)), 1) AS BIGINT) AS precision_pm,
        |  CAST((1000 * (tot.n_pos - (p.cum - p.c)))
        |    // greatest(tot.n_pos, 1) AS BIGINT) AS recall_pm,
        |  CAST((2000 * (tot.n_pos - (p.cum - p.c)))
        |    // greatest(2 * (tot.n_pos - (p.cum - p.c))
        |             + (tot.n_neg - (n.cum - n.c)) + (p.cum - p.c), 1)
        |    AS BIGINT) AS f1_pm
        |FROM cg p JOIN cg n ON p.s = n.s AND p.y = 1 AND n.y = -1, tot""".stripMargin) { (s, dir) =>
      val grid = marginGrid(s, dir)
        .transform(graft.Graft.stagedCheckpoint) // p x n self-join
      val p = grid.filter(col("y") === 1L)
        .select(col("s"), col("c").as("cp"), col("cum").as("cump"),
          col("n_pos"), col("n_neg"))
      val n = grid.filter(col("y") === -1L)
        .select(col("s"), col("c").as("cn"), col("cum").as("cumn"))
      p.join(n, Seq("s"))
        .select(col("s").as("thresh"),
          (col("n_pos") - (col("cump") - col("cp"))).as("tp"),
          (col("n_neg") - (col("cumn") - col("cn"))).as("fp"),
          (col("cump") - col("cp")).as("fn"))
        .select(col("thresh"), col("tp"), col("fp"), col("fn"),
          expr("CAST((1000 * tp) DIV greatest(tp + fp, 1) AS BIGINT)")
            .as("precision_pm"),
          expr("CAST((1000 * tp) DIV greatest(tp + fn, 1) AS BIGINT)")
            .as("recall_pm"),
          expr("CAST((2000 * tp) DIV greatest(2 * tp + fp + fn, 1) AS BIGINT)")
            .as("f1_pm"))
    })
}
