package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Distribution-drift monitoring tier — the statistics a production
  * ingest pipeline runs to answer "did this source change?" BEFORE any
  * downstream selection/dedup tier (q203+) re-tunes its thresholds:
  * the two-sample tests (Kolmogorov-Smirnov, Mann-Whitney U), the
  * transport distance (Wasserstein-1), the divergence family over
  * vocabulary (per-term-quantized Pearson chi-square, quantized
  * Jensen-Shannon),
  * the industry drift score (PSI), and blocked fuzzy string matching
  * for dimension-value reconciliation.
  *
  * Everything here follows the catalog's exactness discipline: counts
  * and cross-multiplied integer numerators only, quotients via the
  * shared trunc/floor-safe division (all dividends non-negative), logs
  * via q256's shared-constant quantized dyadic log2, and wide products
  * through DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so both engines
  * derive bit-identical BIGINT results.
  *
  * Scale shape (shared by the two-sample family): the corpus collapses
  * FIRST to per-(source, value) histograms — map-side combine, state
  * bounded by |sources| x |value domain|, never by rows. CDFs run as a
  * window partitioned BY SOURCE over the densified grid (each task
  * holds one source's domain-sized slice), and the pair space is
  * |sources|^2 x |domain| grid rows — a census join, not a row join.
  * At 100 TB only the first groupBy touches data volume; everything
  * after is domain-sized.
  */
object Drift {

  /** A frozen reference CDF — the batch-trained artifact the streaming
    * drift monitor ([[graft.streaming.StreamDrift]]) judges incoming
    * windows against (the train-offline / serve-online split
    * StreamBuckets established for q204): `points` is the sorted
    * (value, cumulative count) step function, `n` its total. */
  final case class RefCdf(points: IndexedSeq[(Long, Long)], n: Long) {
    require(points.nonEmpty && n > 0, "reference CDF must be non-empty")
  }

  /** One output row of the drift chart (batch and stream twins). */
  final case class DriftRow(
      source: String, epoch_hour: Long, n_window: Long,
      ks_pm: Long, w1_milli: Long)

  /** The exact two-sample statistic of q273, window-vs-reference: KS
    * permille and Wasserstein-1 milli between an hour's histogram and
    * a frozen [[RefCdf]], over the UNION domain, with the same single
    * integer numerator |cum_w * n_ref - cum_ref * n_w| feeding both.
    * Pure function shared VERBATIM by the batch chart and the stream
    * kernel — the stream ≡ batch proof covers this exact code. */
  private[graft] def ksW1(hist: Map[Long, Long], ref: RefCdf): (Long, Long, Long) = {
    val nW = hist.values.sum
    require(nW > 0, "empty window histogram")
    val dom = (hist.keySet ++ ref.points.map(_._1)).toIndexedSeq.sorted
    var cumW = 0L
    var ri = 0
    var maxD = 0L
    var w1 = 0L
    var i = 0
    while (i < dom.length) {
      val v = dom(i)
      cumW += hist.getOrElse(v, 0L)
      while (ri < ref.points.length && ref.points(ri)._1 <= v) ri += 1
      val cumR = if (ri == 0) 0L else ref.points(ri - 1)._2
      val d = math.abs(cumW * ref.n - cumR * nW)
      if (d > maxD) maxD = d
      if (i + 1 < dom.length) w1 += d * (dom(i + 1) - v)
      i += 1
    }
    (nW, 1000L * maxD / (nW * ref.n), 1000L * w1 / (nW * ref.n))
  }

  /** Build the frozen per-source reference CDFs from a static corpus —
    * the model-sized offline training step (the collect is domain x
    * |sources| rows, never corpus rows). `valueCol` names the monitored
    * value column EXPLICITLY (ADVICE r14: the train half used to read
    * 'n_chars' while the serve halves read 'v', a rename landmine for
    * callers handing both halves generic frames — now every caller
    * states the contract at both ends). */
  def referenceCdfs(docs: DataFrame, valueCol: String): Map[String, RefCdf] =
    docs.groupBy(col("source"), col(valueCol).as("v"))
      .agg(count(lit(1)).cast("bigint").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (s, rows) =>
        val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
        var cum = 0L
        val cdf = pts.map { case (v, c) => cum += c; (v, cum) }.toIndexedSeq
        s -> RefCdf(cdf, cum)
      }

  /** Batch drift chart: per (source, hour), KS/W1 of that hour's
    * length distribution against the frozen reference — the nightly
    * recompute the streaming monitor must agree with. Rows collapse to
    * (source, hour, value) histogram cells FIRST (map-side combine),
    * so the typed per-group pass holds domain-sized state only. */
  def driftChart(docs: DataFrame, ref: Map[String, RefCdf],
      valueCol: String): Dataset[DriftRow] = {
    val s = docs.sparkSession
    import s.implicits._
    val refs = ref // stable closure capture
    docs.select(col("source"), (unix_timestamp(col("ts")) / 3600L).cast("long").as("h"),
        col(valueCol).as("v"))
      .filter(col("source").isin(refs.keys.toSeq: _*))
      .groupBy(col("source"), col("h"), col("v"))
      .agg(count(lit(1)).cast("bigint").as("c"))
      .as[(String, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, Long), it: Iterator[(String, Long, Long, Long)]) =>
        val hist = it.map(r => r._3 -> r._4).toMap
        val (n, ks, w1) = ksW1(hist, refs(key._1))
        DriftRow(key._1, key._2, n, ks, w1)
      }
  }

  /** Densified per-source CDF grid over the document length domain:
    * (source, n, v, c, cum) for EVERY (source, domain value) cell —
    * absent cells carry c=0 so window cumsums yield right-continuous
    * empirical CDFs on the shared grid. Shared by q273 (KS/W1) and
    * q274 (Mann-Whitney), each of which self-joins it into pairs.
    */
  private def lengthCdfGrid(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(s, dir)
      .groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).cast("bigint").as("c"))
      .transform(graft.Graft.stagedCheckpoint) // feeds totals, domain, grid
    val tot = hist.groupBy(col("source"))
      .agg(sum(col("c")).cast("bigint").as("n"))
    val dom = hist.select(col("v")).distinct()
    dom.crossJoin(broadcast(tot))
      .join(hist, Seq("source", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("source")).orderBy(col("v")))
          .cast("bigint"))
      .transform(graft.Graft.stagedCheckpoint) // self-joined a x b below
  }

  /** The common DuckDB CTE prefix building the same densified grid. */
  private val duckCdfGrid: String =
    """WITH h AS (SELECT source, n_chars AS v, count(*)::BIGINT AS c
      |  FROM documents GROUP BY 1, 2),
      |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
      |d AS (SELECT DISTINCT v FROM h),
      |g AS (SELECT t.source, t.n, d.v, COALESCE(h.c, 0) AS c
      |      FROM d CROSS JOIN t
      |      LEFT JOIN h ON h.source = t.source AND h.v = d.v),
      |cg AS (SELECT source, n, v, c,
      |        CAST(sum(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cum
      |       FROM g)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    q("q273_dist_drift",
      """Two-sample distribution drift between every ordered source
        |pair over the document-length distribution: the exact
        |Kolmogorov-Smirnov statistic (Kolmogorov 1933 / Smirnov 1939)
        |in permille, D = max_v |F_a(v) - F_b(v)|, and the exact
        |Wasserstein-1 transport distance (Monge-Kantorovich; for 1-D
        |empirical CDFs W1 = integral |F_a - F_b| dv, Ramdas et al.
        |2017) in milli-length-units. Both ride ONE integer numerator
        |per grid cell, |cum_a*n_b - cum_b*n_a|, so no rational ever
        |materializes: KS takes its max, W1 its gap-weighted sum
        |(gap = distance to the next domain value; the last cell's gap
        |is 0 and its numerator is identically 0 anyway since both
        |CDFs have reached their totals). This is the ingest monitor's
        |first chart: KS catches shape change, W1 weighs HOW FAR the
        |mass moved — a pair can share KS and differ 10x in W1.
        |Scale shape: corpus -> (source, length) histogram (map-side
        |combine, domain-sized), CDFs via a source-partitioned window
        |over the densified grid, then a |sources|^2 x |domain| census
        |self-join. Numerators stay inside BIGINT up to n ~ 3e9 docs
        |per source; past that the DECIMAL(38,0)/HUGEINT widening the
        |divergence queries already use applies verbatim.""".stripMargin,
      s"""$duckCdfGrid,
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |        a.n AS n_a, b.n AS n_b, a.v,
        |        abs(a.cum * b.n - b.cum * a.n) AS dnum
        |      FROM cg a JOIN cg b ON a.v = b.v AND a.source < b.source),
        |pg AS (SELECT *, COALESCE(lead(v) OVER (PARTITION BY source_a, source_b
        |                                        ORDER BY v) - v, 0) AS gap
        |       FROM p)
        |SELECT source_a, source_b, n_a, n_b,
        |  CAST((1000 * max(dnum)) // (n_a * n_b) AS BIGINT) AS ks_pm,
        |  CAST((1000 * sum(dnum * gap)) // (n_a * n_b) AS BIGINT) AS w1_milli
        |FROM pg GROUP BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
      val cg = lengthCdfGrid(s, dir)
      val a = cg.select(col("source").as("source_a"), col("n").as("n_a"),
        col("v"), col("cum").as("cum_a"))
      val b = cg.select(col("source").as("source_b"), col("n").as("n_b"),
        col("v"), col("cum").as("cum_b"))
      val p = a.join(b, Seq("v"))
        .filter(col("source_a") < col("source_b"))
        .withColumn("dnum", abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      val pairW = Window.partitionBy(col("source_a"), col("source_b")).orderBy(col("v"))
      p.withColumn("gap", coalesce(lead(col("v"), 1).over(pairW) - col("v"), lit(0L)))
        .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
        .agg(expr("CAST((1000 * max(dnum)) DIV (n_a * n_b) AS BIGINT)").as("ks_pm"),
          expr("CAST((1000 * sum(dnum * gap)) DIV (n_a * n_b) AS BIGINT)").as("w1_milli"))
    },

    // ------------------------------------------------------------------
    q("q274_mann_whitney",
      """Mann-Whitney U rank-sum test (Mann & Whitney 1947) between
        |every ordered source pair over document length, tie-corrected
        |via midranks and kept integer by DOUBLING: u2 = 2*U_a =
        |sum_v c_a(v) * (2*cumlt_b(v) + c_b(v)) where cumlt is the
        |count strictly below v — each tie contributes exactly 1 to u2
        |(the half-credit midrank convention, doubled). From u2 follow
        |the two effect sizes the test is actually run for: auc_pm =
        |P(A > B) + P(A = B)/2 in permille (the probability of
        |superiority — the same AUC a ranking model reports), and the
        |rank-biserial correlation rb_pm = 2*AUC - 1 in permille
        |(Wendt 1972), signed: positive means source_a's documents run
        |longer. KS (q273) answers "do the distributions differ
        |anywhere"; U answers the monitor's directional question "did
        |this source's documents get systematically longer/shorter"
        |with an effect size that is comparable across pairs.
        |Scale shape: identical to q273 — the same densified histogram
        |grid, one pair census join, u2 <= 2*n_a*n_b so BIGINT holds
        |to ~2e9 docs per source before the DECIMAL widening.""".stripMargin,
      s"""$duckCdfGrid
        |SELECT a.source AS source_a, b.source AS source_b,
        |  a.n AS n_a, b.n AS n_b,
        |  CAST(sum(a.c * (2 * (b.cum - b.c) + b.c)) AS BIGINT) AS u2,
        |  CAST((500 * CAST(sum(a.c * (2 * (b.cum - b.c) + b.c)) AS BIGINT))
        |       // (a.n * b.n) AS BIGINT) AS auc_pm,
        |  CAST((1000 * CAST(sum(a.c * (2 * (b.cum - b.c) + b.c)) AS BIGINT))
        |       // (a.n * b.n) - 1000 AS BIGINT) AS rb_pm
        |FROM cg a JOIN cg b ON a.v = b.v AND a.source < b.source
        |GROUP BY 1, 2, 3, 4""".stripMargin) { (s, dir) =>
      val cg = lengthCdfGrid(s, dir)
      val a = cg.select(col("source").as("source_a"), col("n").as("n_a"),
        col("v"), col("c").as("c_a"))
      val b = cg.select(col("source").as("source_b"), col("n").as("n_b"),
        col("v"), col("c").as("c_b"), col("cum").as("cum_b"))
      a.join(b, Seq("v"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
        .agg(sum(col("c_a") * (lit(2L) * (col("cum_b") - col("c_b")) + col("c_b")))
          .cast("bigint").as("u2"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("u2"),
          expr("CAST((500 * u2) DIV (n_a * n_b) AS BIGINT)").as("auc_pm"),
          expr("CAST((1000 * u2) DIV (n_a * n_b) - 1000 AS BIGINT)").as("rb_pm"))
    },

    // ------------------------------------------------------------------
    q("q275_fuzzy_name_match",
      """Blocked fuzzy string matching over the part-name dimension —
        |the record-linkage census (Fellegi & Sunter 1969; blocked
        |edit-distance joins per Gravano et al. 2001): candidate pairs
        |are generated only WITHIN a block (the name's last token, the
        |head noun), then verified with exact Levenshtein distance <= 2
        |(both engines implement the standard Wagner-Fischer edit
        |distance, cross-checked). Per block: distinct names, candidate
        |pairs actually checked n*(n-1)/2, verified fuzzy-match pairs,
        |and the ROW-pair mass those name pairs represent (sum of
        |count products — what a fuzzy dedup would link).
        |Scale shape: the join runs over the DISTINCT-VALUE domain,
        |never rows — names dedup to (name, cnt) first (map-side
        |combine), so the quadratic verification is |distinct names in
        |block|^2, a vocabulary-squared bound that is independent of
        |row count; row mass re-enters only as multiplied counts. This
        |is the difference between fuzzy-matching 100 TB of rows and
        |fuzzy-matching the value dictionary those rows draw from.""".stripMargin,
      """WITH names AS (
        |  SELECT p_name AS name, count(*)::BIGINT AS cnt FROM part GROUP BY 1),
        |blk AS (SELECT name, cnt, string_split(name, ' ')[-1] AS noun FROM names),
        |base AS (SELECT noun, count(*)::BIGINT AS n_names,
        |           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_cand_pairs
        |         FROM blk GROUP BY 1),
        |m AS (SELECT a.noun, count(*)::BIGINT AS n_match_pairs,
        |        CAST(sum(a.cnt * b.cnt) AS BIGINT) AS n_row_pairs
        |      FROM blk a JOIN blk b ON a.noun = b.noun AND a.name < b.name
        |      WHERE levenshtein(a.name, b.name) <= 2
        |      GROUP BY 1)
        |SELECT base.noun, n_names, n_cand_pairs,
        |  COALESCE(m.n_match_pairs, 0) AS n_match_pairs,
        |  COALESCE(m.n_row_pairs, 0) AS n_row_pairs
        |FROM base LEFT JOIN m ON m.noun = base.noun""".stripMargin) { (s, dir) =>
      val names = Tables.part(s, dir)
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .withColumn("noun", element_at(split(col("name"), " "), -1))
        .transform(graft.Graft.stagedCheckpoint) // base census + both join sides
      val base = names.groupBy(col("noun"))
        .agg(count(lit(1)).cast("bigint").as("n_names"),
          expr("CAST(count(1) * (count(1) - 1) DIV 2 AS BIGINT)").as("n_cand_pairs"))
      val a = names.select(col("noun"), col("name").as("name_a"), col("cnt").as("cnt_a"))
      val b = names.select(col("noun"), col("name").as("name_b"), col("cnt").as("cnt_b"))
      val m = a.join(b, Seq("noun"))
        .filter(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 2)
        .groupBy(col("noun"))
        .agg(count(lit(1)).cast("bigint").as("n_match_pairs"),
          sum(col("cnt_a") * col("cnt_b")).cast("bigint").as("n_row_pairs"))
      base.join(m, Seq("noun"), "left")
        .select(col("noun"), col("n_names"), col("n_cand_pairs"),
          coalesce(col("n_match_pairs"), lit(0L)).as("n_match_pairs"),
          coalesce(col("n_row_pairs"), lit(0L)).as("n_row_pairs"))
    },

    // ------------------------------------------------------------------
    q("q276_vocab_divergence",
      """Vocabulary drift between every ordered source pair, reported
        |through BOTH lenses the divergence literature offers: the
        |Pearson chi-square divergence chi2 = sum_t (p_t - q_t)^2
        |/ (p_t + q_t) in micro-units, QUANTIZED PER-TERM: counts are
        |cross-multiplied (x = c_a*n_b, y = c_b*n_a) so each term is a
        |ratio of integers, but the per-term quotient (1e6*|x-y|) //
        |(x+y) floors BEFORE the second |x-y| multiply — deterministic
        |and cross-engine identical, losing up to ~1 micro-unit per
        |vocabulary term (up to |vocab| micro-units total; unlike the
        |single-numerator statistics in q273/q274, which are exact).
        |The floor-first form is what bounds the quotient by 1e6 BY
        |CONSTRUCTION, so no division can overflow at any corpus
        |size. Beside it, the Jensen-Shannon divergence (Lin 1991) in
        |micro-bits via q256's shared-constant quantized dyadic log2.
        |The JS value is pinned bit-identical cross-engine but carries
        |the table's one-sided quantization floor (<= 0.0224 bits per
        |log term), so divergences under ~0.05 bits clamp toward 0 —
        |which is WHY the chi-square rides alongside: its micro-unit
        |per-term quantization is ~2000x finer than the JS table's
        |floor in the small-divergence regime, while JS gives
        |the bounded [0,1]-bit number practitioners compare across
        |corpora (the two orderings agree: chi2/4 <= JS*ln2 <= chi2/2
        |for nearby distributions). Scale shape: (source, token)
        |counts with map-side combine (vocab-sized state), a vocab x
        ||sources| densified grid, one token-keyed pair join; term
        |sums in DECIMAL(38,0)/HUGEINT.""".stripMargin,
      {
        val l2x2 = TextOps.log2MicroDuck("(2*x)")
        val l2y2 = TextOps.log2MicroDuck("(2*y)")
        val l2xy = TextOps.log2MicroDuck("(x+y)")
        s"""WITH tk AS (SELECT source, unnest(string_split(lower(text), ' ')) AS tok
          |  FROM documents),
          |tc AS (SELECT source, tok, count(*)::BIGINT AS c
          |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
          |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
          |d AS (SELECT DISTINCT tok FROM tc),
          |g AS (SELECT ns.source, ns.n, d.tok, COALESCE(tc.c, 0) AS c
          |      FROM d CROSS JOIN ns
          |      LEFT JOIN tc ON tc.source = ns.source AND tc.tok = d.tok),
          |p AS (SELECT a.source AS source_a, b.source AS source_b,
          |        a.n AS n_a, b.n AS n_b, a.c * b.n AS x, b.c * a.n AS y
          |      FROM g a JOIN g b ON a.tok = b.tok AND a.source < b.source),
          |s AS (SELECT source_a, source_b, n_a, n_b,
          |        sum(CASE WHEN x + y > 0
          |              THEN ((CAST(1000000 AS HUGEINT) * abs(x - y)) // (x + y))
          |                   * abs(x - y)
          |              ELSE CAST(0 AS HUGEINT) END) AS chi_num,
          |        sum(CASE WHEN x > 0
          |              THEN CAST(x AS HUGEINT) * ($l2x2 - $l2xy)
          |              ELSE CAST(0 AS HUGEINT) END
          |          + CASE WHEN y > 0
          |              THEN CAST(y AS HUGEINT) * ($l2y2 - $l2xy)
          |              ELSE CAST(0 AS HUGEINT) END) AS js_num
          |      FROM p GROUP BY 1, 2, 3, 4)
          |SELECT source_a, source_b, n_a, n_b,
          |  CAST(chi_num // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS chi2_micro,
          |  CAST(greatest(js_num, 0) // (2 * CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
          |    AS js_microbits
          |FROM s""".stripMargin
      }) { (s, dir) =>
      val l2x2 = TextOps.log2MicroSpark("(2*x)")
      val l2y2 = TextOps.log2MicroSpark("(2*y)")
      val l2xy = TextOps.log2MicroSpark("(x+y)")
      val tc = Tables.documents(s, dir)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).cast("bigint").as("c"))
        .transform(graft.Graft.stagedCheckpoint) // totals, domain, grid
      val ns = tc.groupBy(col("source")).agg(sum(col("c")).cast("bigint").as("n"))
      val d = tc.select(col("tok")).distinct()
      val g = d.crossJoin(broadcast(ns))
        .join(tc, Seq("source", "tok"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .transform(graft.Graft.stagedCheckpoint) // self-joined a x b
      val a = g.select(col("tok"), col("source").as("source_a"),
        col("n").as("n_a"), col("c").as("c_a"))
      val b = g.select(col("tok"), col("source").as("source_b"),
        col("n").as("n_b"), col("c").as("c_b"))
      a.join(b, Seq("tok"))
        .filter(col("source_a") < col("source_b"))
        .withColumn("x", col("c_a") * col("n_b"))
        .withColumn("y", col("c_b") * col("n_a"))
        .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
        .agg(
          sum(expr(
            """CASE WHEN x + y > 0
              |  THEN CAST((CAST(1000000 AS DECIMAL(38,0)) * abs(x - y)) DIV (x + y)
              |       AS DECIMAL(38,0)) * abs(x - y)
              |  ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin)).as("chi_num"),
          sum(expr(
            s"""CASE WHEN x > 0
              |  THEN CAST(x AS DECIMAL(38,0)) * ($l2x2 - $l2xy)
              |  ELSE CAST(0 AS DECIMAL(38,0)) END
              |+ CASE WHEN y > 0
              |  THEN CAST(y AS DECIMAL(38,0)) * ($l2y2 - $l2xy)
              |  ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin)).as("js_num"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          expr("CAST(chi_num DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
            .as("chi2_micro"),
          expr("""CAST(greatest(js_num, CAST(0 AS DECIMAL(38,0)))
                 |  DIV (2 * CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""".stripMargin)
            .as("js_microbits"))
    },

    // ------------------------------------------------------------------
    q("q277_psi_drift",
      """Population Stability Index between every ordered source pair —
        |THE deployed-model monitoring number (the credit-scoring
        |standard, PSI = sum_b (p_b - q_b) * ln(p_b / q_b); Karakoulas
        |2004 documents the 0.1/0.25 action thresholds) — over
        |equi-width document-length buckets (width 64 chars, a shared
        |constant, so bucketing is a row-local integer shift that never
        |needs a quantile pass), add-one smoothed (Laplace) so empty
        |buckets stay defined, reported in micro-BITS (divide by 1e6
        |and multiply by ln2 ~ 0.693 for nats; the 0.1-nat "monitor"
        |threshold is ~144k micro-bits). Exactness: with x =
        |(c_a+1)*(n_b+B) and y = (c_b+1)*(n_a+B), the term
        |(x - y)*(log2 x - log2 y) is a product of SAME-SIGN factors
        |(the quantized log2 is monotone — Log2TableSpec pins it), so
        |every term is non-negative, the sum is trunc/floor-safe, and
        |both engines derive the identical BIGINT.
        |Scale shape: (source, bucket) histogram with map-side combine
        |— bucket count is domain/64, hundreds at most — then the same
        |densified-grid pair census as q273/q274; term sums ride
        |DECIMAL(38,0)/HUGEINT.""".stripMargin,
      {
        val l2x = TextOps.log2MicroDuck("x")
        val l2y = TextOps.log2MicroDuck("y")
        s"""WITH h AS (SELECT source, n_chars // 64 AS b, count(*)::BIGINT AS c
          |  FROM documents GROUP BY 1, 2),
          |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
          |d AS (SELECT DISTINCT b FROM h),
          |nb AS (SELECT count(*)::BIGINT AS nbuck FROM d),
          |g AS (SELECT t.source, t.n, d.b, COALESCE(h.c, 0) AS c
          |      FROM d CROSS JOIN t
          |      LEFT JOIN h ON h.source = t.source AND h.b = d.b),
          |p AS (SELECT a.source AS source_a, b2.source AS source_b,
          |        a.n AS n_a, b2.n AS n_b, nb.nbuck,
          |        (a.c + 1) * (b2.n + nb.nbuck) AS x,
          |        (b2.c + 1) * (a.n + nb.nbuck) AS y
          |      FROM g a JOIN g b2 ON a.b = b2.b AND a.source < b2.source
          |      CROSS JOIN nb)
          |SELECT source_a, source_b, n_a, n_b,
          |  CAST(sum(CAST(x - y AS HUGEINT) * ($l2x - $l2y))
          |       // (CAST(n_a + nbuck AS HUGEINT) * (n_b + nbuck)) AS BIGINT)
          |    AS psi_microbits
          |FROM p GROUP BY 1, 2, 3, 4, nbuck""".stripMargin
      }) { (s, dir) =>
      val l2x = TextOps.log2MicroSpark("x")
      val l2y = TextOps.log2MicroSpark("y")
      val h = Tables.documents(s, dir)
        .groupBy(col("source"), expr("n_chars DIV 64").as("b"))
        .agg(count(lit(1)).cast("bigint").as("c"))
        .transform(graft.Graft.stagedCheckpoint) // totals, domain, grid
      val t = h.groupBy(col("source")).agg(sum(col("c")).cast("bigint").as("n"))
      val d = h.select(col("b")).distinct()
      val nb = d.agg(count(lit(1)).cast("bigint").as("nbuck"))
      val g = d.crossJoin(broadcast(t))
        .join(h, Seq("source", "b"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(nb))
        .transform(graft.Graft.stagedCheckpoint) // self-joined a x b
      val a = g.select(col("b"), col("source").as("source_a"), col("n").as("n_a"),
        col("c").as("c_a"), col("nbuck"))
      val b = g.select(col("b"), col("source").as("source_b"), col("n").as("n_b"),
        col("c").as("c_b"))
      a.join(b, Seq("b"))
        .filter(col("source_a") < col("source_b"))
        .withColumn("x", (col("c_a") + 1) * (col("n_b") + col("nbuck")))
        .withColumn("y", (col("c_b") + 1) * (col("n_a") + col("nbuck")))
        .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("nbuck"))
        .agg(sum(expr(s"CAST(x - y AS DECIMAL(38,0)) * ($l2x - $l2y)")).as("num"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          expr("""CAST(num DIV (CAST(n_a + nbuck AS DECIMAL(38,0)) * (n_b + nbuck))
                 |AS BIGINT)""".stripMargin).as("psi_microbits"))
    })
}
