package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-driven attribution tier — the two models that replaced
  * last-click heuristics in marketing/product analytics, both exact
  * and cross-engine deterministic:
  *
  *  - q282: SHAPLEY VALUE attribution (Shapley 1953; the Google
  *    Analytics "data-driven attribution" core) — exact over the
  *    2^|channels| coalition lattice, which is tractable PRECISELY
  *    because the value function collapses to a ≤ 2^n-row census
  *    first (n = 4 channels here; the published deployments cap n at
  *    a dozen for the same reason).
  *  - q283: MARKOV REMOVAL-EFFECT attribution (Anderl et al. 2016,
  *    "Mapping the customer journey") — first-order chain over
  *    session paths, conversion probability from 40 fixed-point
  *    value-iteration steps in integer ppm, and each channel's
  *    removal effect re-solved on the edge-redirected chain.
  *
  * Scale shape: BOTH models are corpus-heavy only in the path
  * extraction (one user-keyed window pass — the q179 sessionization
  * shared shape); everything after is model-sized — a ≤ 16-row
  * coalition census for Shapley, a ≤ |states|² transition matrix for
  * Markov. The Markov solve follows the q246/CCNet train-offline
  * discipline: the matrix COLLECTS to the driver (≤ ~30 rows — model-
  * sized, never corpus-sized) and 5 × 40 integer iterations run in
  * plain Scala, identical to the oracle's recursive CTE because every
  * step is the same BIGINT multiply-sum-truncating-divide.
  */
object Attribution {

  /** Session frame with (user_id, sid, rn, st) where st maps purchase
    * to 'conv' and the path is truncated at the FIRST purchase —
    * shared by both attribution queries. One user-keyed shuffle. */
  private def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cumW = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = expr("unix_micros(ts)") -
      lag(expr("unix_micros(ts)"), 1).over(byTs)
    val sess = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("brk", when(gap > 7200000000L || gap.isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(cumW).cast("long"))
    val bySess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    val pos = sess
      .withColumn("rn", row_number().over(bySess).cast("long"))
      .select(col("user_id"), col("sid"), col("rn"), col("event_type"))
    val fp = pos.groupBy(col("user_id"), col("sid"))
      .agg(min(when(col("event_type") === "purchase", col("rn"))).as("prn"))
    pos.join(fp, Seq("user_id", "sid"))
      .filter(col("prn").isNull || col("rn") <= col("prn"))
      .select(col("user_id"), col("sid"), col("rn"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")).as("st"))
  }

  /** The q282/q283 shared DuckDB CTE prefix: session paths truncated
    * at first purchase, purchase mapped to 'conv'. */
  private val duckPaths: String =
    """marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 7200000000
      |         OR lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM marked),
      |pos AS (
      |  SELECT user_id, sid, event_type,
      |    CAST(row_number() OVER (PARTITION BY user_id, sid
      |                            ORDER BY ts, event_id) AS BIGINT) AS rn
      |  FROM sess),
      |fp AS (SELECT user_id, sid,
      |         min(CASE WHEN event_type = 'purchase' THEN rn END) AS prn
      |       FROM pos GROUP BY 1, 2),
      |kept AS (
      |  SELECT p.user_id, p.sid, p.rn,
      |    CASE WHEN p.event_type = 'purchase' THEN 'conv' ELSE p.event_type END AS st
      |  FROM pos p JOIN fp ON fp.user_id = p.user_id AND fp.sid = p.sid
      |  WHERE fp.prn IS NULL OR p.rn <= fp.prn)""".stripMargin

  /** 40 truncating-integer value-iteration steps for P(conv | start)
    * in ppm, on the transition counts with channel `removed` (edges
    * INTO it redirected to 'null'). Identical arithmetic to the
    * oracle's recursive CTE: v'(s) = sum(cnt * v(next)) / tot(s) with
    * Java long division (≡ DuckDB integer `//`), v(conv) = 1e6,
    * v(null) = 0, v₀ = 0. Pure function — spec-shared. */
  private[graft] def markovConvPpm(
      tc: Seq[(String, String, Long)], removed: Option[String]): Long = {
    val adj = tc.filter { case (s, _, _) => !removed.contains(s) }
      .map { case (s, nx, c) =>
        (s, if (removed.contains(nx)) "null" else nx, c)
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((s, nx), xs) => (s, nx, xs.map(_._3).sum) }
      .toSeq
    val tot = adj.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    var v = tot.keys.map(_ -> 0L).toMap
    var it = 0
    while (it < 40) {
      v = tot.map { case (s, t) =>
        val num = adj.filter(_._1 == s).map { case (_, nx, c) =>
          c * (nx match {
            case "conv" => 1000000L
            case "null" => 0L
            case other  => v.getOrElse(other, 0L)
          })
        }.sum
        s -> num / math.max(t, 1L)
      }
      it += 1
    }
    v.getOrElse("start", 0L)
  }

  /** Hard cap on the Shapley channel count (VERDICT r15 #6). The exact
    * lattice enumerates 2^n coalitions and the channel-term join walks
    * n·2^(n-1) rows — tractable at n=12 (4096 coalitions), doubling per
    * channel past it. Published data-driven-attribution deployments cap
    * at about a dozen channels for exactly this reason. */
  val MaxShapleyChannels = 12

  /** EXACT Shapley-value attribution over an arbitrary ordered channel
    * list (the q282 kernel, generalized): `paths` is a session frame of
    * (user_id, sid, st) rows with 'conv' marking conversion (the
    * [[sessionPaths]] shape); channel i gets bit 1<<i. Coalition value
    * v(S) = converted sessions whose touched-channel set ⊆ S; shares are
    * computed in micro-conversions with the integer factorial weights
    * |S|!(n-|S|-1)! and ONE final division by n! (n ≤ 12 keeps every
    * weight and 1e6·sum(term) far inside BIGINT).
    *
    * GUARDED: more than [[MaxShapleyChannels]] channels refuses loudly
    * at plan time — above ~12 channels the 2^n lattice explodes
    * silently (the fixture's 4 channels never exercise the cliff, so
    * without the guard a wider caller would discover it as an
    * OOM/runaway job, not an error). The >12-channel path is q283's
    * Markov removal-effect attribution ([[markovConvPpm]]), which
    * scales as |states|², not 2^n. */
  private[graft] def shapleyReport(s: SparkSession, paths: DataFrame,
      channels: Seq[String]): DataFrame = {
    require(channels.size <= MaxShapleyChannels,
      s"Shapley attribution enumerates the full 2^n coalition lattice: " +
        s"n=${channels.size} channels exceeds the cap of " +
        s"$MaxShapleyChannels (${1 << MaxShapleyChannels} coalitions), " +
        "and the lattice doubles per extra channel. For wider channel " +
        "sets use q283's Markov removal-effect attribution " +
        "(Attribution.markovConvPpm) — it scales as |states|^2, not 2^n.")
    require(channels.nonEmpty && channels.distinct.size == channels.size &&
        !channels.contains("conv"),
      "channels must be non-empty, distinct, and not the absorbing 'conv'")
    val n = channels.size
    val full = (1L << n) - 1L
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _.toLong)
    val maskCase = channels.zipWithIndex
      .map { case (ch, i) => s"WHEN '$ch' THEN ${1L << i}" }
      .mkString("CASE st ", " ", " END")
    val weightCase = (0 until n)
      .map(k => s"WHEN $k THEN ${fact(k) * fact(n - 1 - k)}")
      .mkString("CASE bit_count(s0) ", " ", " END")
    val sm = paths
      .groupBy(col("user_id"), col("sid"))
      .agg(coalesce(expr(s"sum(DISTINCT $maskCase)"), lit(0L))
          .cast("long").as("mask"),
        max(when(col("st") === "conv", 1).otherwise(0)).as("conv"))
    val census = sm.filter(col("conv") === 1)
      .groupBy(col("mask")).agg(count(lit(1)).cast("bigint").as("c"))
    val subsets = s.range(1L << n).select(col("id").cast("long").as("s"))
    val v = subsets.join(broadcast(census),
        expr("(mask & s) = mask"), "left")
      .groupBy(col("s"))
      .agg(coalesce(sum(col("c")), lit(0L)).cast("bigint").as("val"))
      .transform(graft.Graft.stagedCheckpoint) // terms x2 + 3 scalar slices
    import s.implicits._
    val ch = channels.zipWithIndex.map { case (c, i) => (c, 1L << i) }
      .toDF("channel", "bit")
    val v0 = v.select(col("s").as("s0"), col("val").as("val0"))
    val v1 = v.select(col("s").as("s1"), col("val").as("val1"))
    // every join below pairs lattice-bounded frames (≤ n·2^n rows);
    // the small side is PINNED as the broadcast build (VERDICT r16 #7:
    // q282's BNL/HJ build sides must not depend on planner size
    // estimates — the r16 AQE-floor experiment showed a config change
    // flipping these plans detonates superlinearly)
    val terms = broadcast(ch)
      .join(v0, expr("(s0 & bit) = 0"))
      .join(broadcast(v1), col("s1") === col("s0") + col("bit"))
      .select(col("channel"), col("bit"),
        (expr(weightCase) * (col("val1") - col("val0"))).as("term"))
    val vTot = v.filter(col("s") === full).select(col("val").as("v15"))
      .crossJoin(broadcast(v.filter(col("s") === 0).select(col("val").as("v0x"))))
    val solo = v.select(col("s").as("bit"), col("val").as("v_solo"))
    terms.groupBy(col("channel"), col("bit"))
      .agg(expr(s"CAST((1000000 * sum(term)) DIV ${fact(n)} AS BIGINT)")
        .as("shapley_micro"))
      .join(broadcast(solo), Seq("bit"))
      .crossJoin(broadcast(vTot))
      .select(col("channel"), col("shapley_micro"), col("v_solo"),
        (col("v15") - col("v0x")).cast("long").as("n_conv_attributable"),
        col("v0x").cast("long").as("n_conv_unattributable"))
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    q("q282_shapley_attribution",
      """EXACT Shapley-value conversion attribution (Shapley 1953; the
        |model behind Google Analytics' data-driven attribution):
        |channels = the four non-purchase event types a converting
        |session touched, coalition value v(S) = converted sessions
        |whose channel set ⊆ S, and each channel's Shapley share
        |phi_i = sum over coalitions S not containing i of
        ||S|!(n-|S|-1)!/n! * (v(S u i) - v(S)) — computed exactly in
        |micro-conversions with ONE final division (the factorial
        |weights 6/2/2/6 stay integer, /4! applied once per channel),
        |so efficiency holds to truncation: sum phi = v(full) - v(empty)
        |within 4 micro-units (v(empty) = purchase-only sessions with
        |no channel touch — unattributable by definition, reported).
        |Coalitions are BITMASKS (click=1, error=2, signup=4, view=8)
        |and v materializes by the subset-sum join mask & S = mask.
        |Scale shape: the corpus collapses to a ≤ 16-row coalition
        |census in one sessionize-shuffle + one map-side-combined agg;
        |the 2^n lattice math runs on that census alone — the exact
        |reason published deployments cap n ~ 12.""".stripMargin,
      s"""WITH $duckPaths,
        |sm AS (
        |  SELECT user_id, sid,
        |    CAST(COALESCE(sum(DISTINCT CASE st WHEN 'click' THEN 1
        |      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
        |      WHEN 'view' THEN 8 END), 0) AS BIGINT) AS mask,
        |    max(CASE WHEN st = 'conv' THEN 1 ELSE 0 END) AS conv
        |  FROM kept GROUP BY 1, 2),
        |census AS (SELECT mask, count(*)::BIGINT AS c FROM sm
        |           WHERE conv = 1 GROUP BY 1),
        |subsets AS (SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT) AS s),
        |v AS (SELECT s, CAST(COALESCE(sum(c.c), 0) AS BIGINT) AS val
        |      FROM subsets LEFT JOIN census c ON (c.mask & subsets.s) = c.mask
        |      GROUP BY s),
        |ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
        |       ('error', 2), ('signup', 4), ('view', 8)) AS t(channel, bit)),
        |terms AS (
        |  SELECT ch.channel, ch.bit,
        |    CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2
        |         WHEN 2 THEN 2 ELSE 6 END * (v1.val - v0.val) AS term
        |  FROM ch
        |  JOIN v v0 ON (v0.s & ch.bit) = 0
        |  JOIN v v1 ON v1.s = v0.s + ch.bit)
        |SELECT t.channel,
        |  CAST((1000000 * sum(t.term)) // 24 AS BIGINT) AS shapley_micro,
        |  CAST((SELECT val FROM v WHERE s = t.bit) AS BIGINT) AS v_solo,
        |  CAST((SELECT val FROM v WHERE s = 15)
        |     - (SELECT val FROM v WHERE s = 0) AS BIGINT) AS n_conv_attributable,
        |  CAST((SELECT val FROM v WHERE s = 0) AS BIGINT) AS n_conv_unattributable
        |FROM terms t GROUP BY t.channel, t.bit""".stripMargin) { (s, dir) =>
      // the guarded general kernel ([[shapleyReport]]) with the event
      // schema's four non-purchase channels: click=1, error=2,
      // signup=4, view=8 — identical lattice, weights (6/2/2/6) and
      // /24 division to the pre-r16 inline version
      shapleyReport(s, sessionPaths(s, dir),
        Seq("click", "error", "signup", "view"))
    },

    // ------------------------------------------------------------------
    q("q283_markov_attribution",
      """Markov removal-effect attribution (Anderl et al. 2016): the
        |session paths (truncated at first purchase, purchase mapped to
        |the absorbing 'conv', path end to absorbing 'null') define a
        |first-order chain; P(conv | start) comes from 40 fixed-point
        |value-iteration steps in integer ppm (identical truncating
        |arithmetic in both engines — the iteration count is part of
        |the statistic's definition, so convergence-rate differences
        |cannot desynchronize them); each channel's removal effect
        |re-solves the chain with edges INTO the channel redirected to
        |'null' (the channel is unavailable, journeys that needed it
        |die). Monotonicity is structural: redirecting edges to the
        |0-valued absorber can only lower every v, so
        |p_removed <= p_conv and removal_ppm >= 0 by induction over
        |iterations — no signed division anywhere. Output: the base
        |row '(none)' plus one row per channel with its removed-chain
        |conversion and removal effect share.
        |Scale shape: path extraction is the q179 sessionize shuffle;
        |the transition matrix is ≤ |states|² ~ 30 rows and COLLECTS
        |(model-sized, the q246 discipline); 5 variants x 40
        |iterations of ≤ 7-row integer algebra run driver-side in
        |microseconds; the oracle runs the same iterations as a
        |recursive CTE with aggregation.
        |DuckDB-VERSION NOTE (ADVICE r14): that CTE references the
        |recursive table TWICE in the recursive term (r for the state
        |row, rv for v(next)) — valid on the pinned DuckDB v1.0.0 the
        |driver runs, but multiple recursive self-references are
        |nonstandard SQL whose validity has shifted across DuckDB
        |releases; if the pin ever moves and this oracle breaks,
        |restructure the iteration to reference r once (carry the full
        |v-vector as a per-iteration LIST/STRUCT row).""".stripMargin,
      s"""WITH RECURSIVE $duckPaths,
        |led AS (SELECT st AS s, rn, user_id, sid,
        |    COALESCE(lead(st) OVER (PARTITION BY user_id, sid ORDER BY rn),
        |             'null') AS nx
        |  FROM kept),
        |edges AS (
        |  SELECT s, nx FROM led WHERE s <> 'conv'
        |  UNION ALL SELECT 'start', s FROM led WHERE rn = 1),
        |tc AS (SELECT s, nx, count(*)::BIGINT AS cnt FROM edges GROUP BY 1, 2),
        |variants AS (SELECT * FROM (VALUES ('(none)'), ('click'), ('error'),
        |             ('signup'), ('view')) AS t(removed)),
        |vt AS (
        |  SELECT v.removed, tc.s,
        |    CASE WHEN tc.nx = v.removed THEN 'null' ELSE tc.nx END AS nx,
        |    CAST(sum(cnt) AS BIGINT) AS cnt
        |  FROM variants v JOIN tc ON tc.s <> v.removed
        |  GROUP BY 1, 2, 3),
        |tot AS (SELECT removed, s, CAST(sum(cnt) AS BIGINT) AS tot
        |        FROM vt GROUP BY 1, 2),
        |states AS (SELECT DISTINCT removed, s FROM vt),
        |r AS (
        |  SELECT 0 AS it, removed, s, CAST(0 AS BIGINT) AS v FROM states
        |  UNION ALL
        |  SELECT r.it + 1, vt.removed, vt.s,
        |    CAST(sum(vt.cnt * CASE vt.nx WHEN 'conv' THEN 1000000
        |             WHEN 'null' THEN 0 ELSE rv.v END)
        |         // greatest(tot.tot, 1) AS BIGINT)
        |  FROM r
        |  JOIN vt ON vt.removed = r.removed AND vt.s = r.s
        |  JOIN tot ON tot.removed = vt.removed AND tot.s = vt.s
        |  LEFT JOIN r rv ON rv.removed = r.removed AND rv.s = vt.nx
        |                AND rv.it = r.it
        |  WHERE r.it < 40
        |  GROUP BY r.it, vt.removed, vt.s, tot.tot),
        |p AS (SELECT removed, v AS p_ppm FROM r WHERE it = 40 AND s = 'start'),
        |base AS (SELECT p_ppm AS p0 FROM p WHERE removed = '(none)')
        |SELECT p.removed AS channel, p.p_ppm AS p_conv_ppm,
        |  CAST((1000000 * (base.p0 - p.p_ppm)) // greatest(base.p0, 1) AS BIGINT)
        |    AS removal_ppm
        |FROM p, base""".stripMargin) { (s, dir) =>
      val bySess = Window.partitionBy(col("user_id"), col("sid")).orderBy(col("rn"))
      val led = sessionPaths(s, dir)
        .withColumn("nx", coalesce(lead(col("st"), 1).over(bySess), lit("null")))
      val edges = led.filter(col("st") =!= "conv")
        .select(col("st").as("s"), col("nx"))
        .unionAll(led.filter(col("rn") === 1)
          .select(lit("start").as("s"), col("st").as("nx")))
      val tcRows = edges.groupBy(col("s"), col("nx"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .collect() // model-sized: <= |states|^2 ~ 30 rows (q246 discipline)
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val variants = Seq("(none)", "click", "error", "signup", "view")
      val p = variants.map { ch =>
        ch -> markovConvPpm(tcRows, Some(ch).filter(_ != "(none)"))
      }.toMap
      val p0 = p("(none)")
      import s.implicits._
      // empty corpus => no transition matrix => empty report, matching
      // the oracle's empty recursion output
      val out =
        if (tcRows.isEmpty) Seq.empty[(String, Long, Long)]
        else variants.map { ch =>
          (ch, p(ch), 1000000L * (p0 - p(ch)) / math.max(p0, 1L))
        }
      out.toDF("channel", "p_conv_ppm", "removal_ppm")
    })
}
