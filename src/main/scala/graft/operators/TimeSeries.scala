package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Time-series analytics tier — the bar/indicator operators every
  * metrics warehouse and market-data pipeline runs over an event
  * stream: time-weighted averages (TWAP), OHLC bars, the Pearson
  * cross-correlation matrix between series, and Holt's linear-trend
  * exponential smoothing with dyadic coefficients.
  *
  * Exactness discipline: money stays in BIGINT cents (the q178
  * DECIMAL(18,2)*100 convention), time in integer micros/hours,
  * Pearson through DECIMAL(38,0)/HUGEINT cross-moments with the
  * quotient bounded by Cauchy-Schwarz and the intermediates guarded
  * by the shared r2PpmExpr template (the bound covers only the final
  * quotient), and the Holt recurrence uses
  * alpha = beta = 1/4 so every step is one integer division that
  * TRUNCATES toward zero in both engines (Java long `/` in the Scala
  * kernel; DuckDB's integer `//` truncates on BIGINT even though it
  * floors on DOUBLE) — negative trends step identically everywhere.
  *
  * Scale shape: q278/q279 ride day/hour-bounded windows (never a
  * per-type global sort); q280 collapses to an hour-spine census
  * before any pairing; q281 is the funnel/packing recurrence
  * discipline — ONE hash shuffle of the wall-clock-bounded spine,
  * spill-safe local sort, O(1) state per series, with the step
  * function shared verbatim with the streaming twin
  * ([[graft.streaming.StreamHolt]]).
  */
object TimeSeries {

  /** Holt's linear-trend state (Holt 1957; Hyndman & Athanasopoulos
    * fpp3 §8.2) with alpha = beta = 1/4, all integer milli-units:
    *   l_t = (1000*y_t + 3*(l + b)) / 4
    *   b_t = ((l_t - l) + 3*b) / 4
    * divisions TRUNCATE toward zero — Java's long `/`, which is what
    * BOTH SQL engines do on integers (DuckDB `//` truncates on
    * BIGINT, (-7)//4 = -1, despite flooring on DOUBLE; Spark DIV
    * truncates), so negative trends step identically everywhere.
    * `sae` accumulates |1-step forecast error|; the first observation
    * initializes l = 1000*y, b = 0 and is not a forecast. `step` is
    * shared VERBATIM by batch q281, the per-hour chart kernel, and
    * the streaming twin — the stream ≡ batch proof covers this exact
    * code. */
  final case class HoltState(n: Long, l: Long, b: Long, sae: Long) {
    def step(y: Long): HoltState =
      if (n == 0L) HoltState(1L, 1000L * y, 0L, 0L)
      else {
        val e = math.abs(1000L * y - (l + b))
        val l2 = (1000L * y + 3L * (l + b)) / 4L
        val b2 = ((l2 - l) + 3L * b) / 4L
        HoltState(n + 1L, l2, b2, sae + e)
      }
  }
  object HoltState { val empty: HoltState = HoltState(0L, 0L, 0L, 0L) }

  /** Overflow-GUARDED r^2-ppm formula shared by q280 and q288 (and by
    * both engines — the Spark and DuckDB programs interpolate the same
    * template). The final quotient 1e6*num^2/(dx*dy) is <= ~1e6 by
    * Cauchy-Schwarz, but the INTERMEDIATE 1e6*num^2 is not bounded by
    * it (ADVICE r14: hourly counts ~1e6 over ~1e4 hours push it to
    * ~1e45, past DECIMAL(38,0)/HUGEINT — where Spark's non-ANSI
    * decimal silently NULLs while DuckDB errors). Guard: when
    * |num| <= 3e15 and dx, dy <= 3e18 every intermediate is <= 9e36
    * (exact branch, bit-identical to the pre-guard formula — all
    * fixtures land here); otherwise BOTH engines take the same
    * rescaled branch, dividing |num|, dx, dy by n before squaring
    * (identical quantization cross-engine; abs() first because the
    * engines' negative-division conventions need not be trusted when
    * the square erases sign anyway). Validity bound of the rescaled
    * branch, q273/q274-style: with per-(type,hour) counts <= C over n
    * hours, |num| DIV n <= n*C^2, so intermediates stay inside 38
    * digits while n*C^2 <= 3e15 — e.g. C = 1e6 events/hour/type for
    * ~3e3 hours (4 months), or C = 1e4 for ~3e7 hours; past that,
    * coarsen the bucket. (q280's cov_num column is additionally a raw
    * BIGINT cast of num, valid while n*C <= 3e9 — the same class of
    * bound q273/q274 document.)
    *
    * `c` wraps a column in the engine's wide-integer cast; `div` is
    * the engine's integral division (Spark DIV / DuckDB //).
    *
    * Every rescaled-branch QUOTIENT is re-wrapped in `c` before it is
    * squared/multiplied (ADVICE r15): Spark's IntegralDivide returns
    * BIGINT even for DECIMAL(38,0) operands, so without the re-wrap
    * `1000000 * (num DIV n) * (num DIV n)` executes in 64-bit long
    * arithmetic and silently wraps (non-ANSI) once a quotient passes
    * ~3.03e6 — far below the branch's documented n*C^2 <= 3e15
    * validity bound — while DuckDB's `//` stays HUGEINT and computes
    * exactly. With the re-wrap both engines square in >=128-bit width
    * (intermediates <= 1e6 * (3e15)^2 = 9e36 < 38 digits) and agree
    * bit-for-bit; TimeSeriesSpec exercises this branch against a
    * BigInt recompute, which is exactly DuckDB's HUGEINT arithmetic
    * at these widths. */
  private def r2PpmExpr(c: String => String, div: String): String = {
    val num = s"(${c("n")} * sxy - ${c("sx")} * sy)"
    val dx = s"(${c("n")} * sxx - ${c("sx")} * sx)"
    val dy = s"(${c("n")} * syy - ${c("sy")} * sy)"
    val qn = c(s"(abs($num) $div n)")
    val qx = c(s"($dx $div n)")
    val qy = c(s"($dy $div n)")
    s"""CASE WHEN abs($num) <= 3000000000000000
       |       AND $dx <= 3000000000000000000
       |       AND $dy <= 3000000000000000000
       |  THEN CAST((1000000 * $num * $num)
       |       $div (greatest($dx, 1) * greatest($dy, 1)) AS BIGINT)
       |  ELSE CAST((1000000 * $qn * $qn)
       |       $div (greatest($qx, 1) * greatest($qy, 1)) AS BIGINT)
       |END""".stripMargin
  }
  private[graft] val r2PpmSpark: String =
    r2PpmExpr(x => s"CAST($x AS DECIMAL(38,0))", "DIV")
  private[graft] val r2PpmDuck: String =
    r2PpmExpr(x => s"CAST($x AS HUGEINT)", "//")

  /** One per-hour row of the Holt chart (batch and stream twins):
    * the state AFTER folding the hour, plus the next-hour forecast. */
  final case class HoltRow(
      event_type: String, epoch_hour: Long, cnt: Long,
      level_milli: Long, trend_milli: Long, forecast_milli: Long)

  /** Per-hour Holt chart over the zero-filled hourly spine — the
    * batch twin [[graft.streaming.StreamHolt]] must reproduce
    * row-for-row. Spine rows hash-shuffle by type ONCE, sort locally
    * by hour, and fold through [[HoltState.step]] with O(1) state. */
  def holtChart(events: DataFrame): Dataset[HoltRow] = {
    val s = events.sparkSession
    import s.implicits._
    EventsOps.hourlySpineOf(events)
      .select(col("event_type"), col("h").cast("long"), col("cnt").cast("long"))
      .as[(String, Long, Long)]
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("h"))
      .mapPartitions { iter =>
        new Iterator[HoltRow] {
          private var cur: String = null
          private var st = HoltState.empty
          private var nextRow: HoltRow = _
          private var has = false
          private def advance(): Unit = {
            has = false
            while (!has && iter.hasNext) {
              val (t, h, y) = iter.next()
              if (t != cur) { cur = t; st = HoltState.empty }
              st = st.step(y)
              nextRow = HoltRow(t, h, y, st.l, st.b, st.l + st.b)
              has = true
            }
          }
          advance()
          def hasNext: Boolean = has
          def next(): HoltRow = { val r = nextRow; advance(); r }
        }
      }
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    q("q278_twap",
      """Time-weighted average value per (event type, day) — TWAP, the
        |execution-quality benchmark (Berkowitz et al. 1988's market-
        |impact yardstick) and equally the correct way to average any
        |last-observation-carried-forward gauge: each observation's
        |value holds until the type's NEXT event, weighted by that
        |interval's exact duration in micros; intervals that cross
        |midnight are excluded so every day's average is self-contained
        |(the deterministic variant of day-clamping — documented, and
        |identical in both engines because the window partitions BY
        |(type, day), making the cross-midnight lead null). All BIGINT:
        |cents x gap-micros accumulates in DECIMAL(38,0)/HUGEINT, the
        |final division is non-negative DIV.
        |Scale shape: the ONLY window partitions by (type, day) — each
        |partition is one day of one type's events, never a global or
        |per-type total order; the census is (type, day)-sized.""".stripMargin,
      """WITH t AS (
        |  SELECT event_type, epoch_us(ts) AS us, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |g AS (
        |  SELECT event_type, day, cents,
        |    lead(us) OVER (PARTITION BY event_type, day
        |                   ORDER BY us, event_id) - us AS gap_us
        |  FROM t)
        |SELECT event_type, day, count(*)::BIGINT AS n_intervals,
        |  CAST(sum(gap_us) AS BIGINT) AS dur_us,
        |  CAST(sum(CAST(cents AS HUGEINT) * gap_us)
        |       // sum(CAST(gap_us AS HUGEINT)) AS BIGINT) AS twap_cents
        |FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val t = Tables.events(s, dir).select(col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("us"), col("event_id"))
      t.withColumn("gap_us", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("gap_us").isNotNull && col("gap_us") > 0)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("bigint").as("n_intervals"),
          sum(col("gap_us")).cast("bigint").as("dur_us"),
          expr("""CAST(sum(CAST(cents AS DECIMAL(38,0)) * gap_us)
                 |DIV sum(CAST(gap_us AS DECIMAL(38,0))) AS BIGINT)""".stripMargin)
            .as("twap_cents"))
    },

    // ------------------------------------------------------------------
    q("q279_ohlc_bars",
      """OHLC candlestick bars per (event type, hour) — the universal
        |time-series downsampling (every market-data store and metrics
        |TSDB materializes these): open and close are the value of the
        |first/last event by the deterministic (ts, event_id) total
        |order WITHIN the bar (a row_number in both engines — never an
        |engine-specific arg_min/first_value whose tie rules could
        |differ), high/low are max/min cents, and mean_cents the exact
        |bar average. Scale shape: the two row_number windows partition
        |by (type, hour) — bar-bounded, thousands of rows each at any
        |corpus size — and everything else is one (type, hour) census
        |aggregate with map-side combine.""".stripMargin,
      """WITH t AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    epoch_us(ts) AS us, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |r AS (
        |  SELECT event_type, h, cents,
        |    row_number() OVER (PARTITION BY event_type, h
        |                       ORDER BY us, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, h
        |                       ORDER BY us DESC, event_id DESC) AS rn_d
        |  FROM t)
        |SELECT event_type, h AS epoch_hour, count(*)::BIGINT AS n_events,
        |  CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
        |  CAST(max(cents) AS BIGINT) AS high_cents,
        |  CAST(min(cents) AS BIGINT) AS low_cents,
        |  CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents
        |FROM r GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val t = Tables.events(s, dir).select(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("h"),
        expr("unix_micros(ts)").as("us"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      val wa = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("us"), col("event_id"))
      val wd = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("us").desc, col("event_id").desc)
      t.withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy(col("event_type"), col("h").as("epoch_hour"))
        .agg(count(lit(1)).cast("bigint").as("n_events"),
          max(when(col("rn_a") === 1, col("cents"))).cast("bigint").as("open_cents"),
          max(col("cents")).cast("bigint").as("high_cents"),
          min(col("cents")).cast("bigint").as("low_cents"),
          max(when(col("rn_d") === 1, col("cents"))).cast("bigint").as("close_cents"),
          expr("CAST(sum(cents) DIV count(1) AS BIGINT)").as("mean_cents"))
    },

    // ------------------------------------------------------------------
    q("q280_type_correlation",
      """Pearson cross-correlation matrix between event-type hourly
        |series — the co-movement statistic q244's rank concordance
        |deliberately avoided and this query makes exact: for every
        |ordered type pair over the GLOBAL zero-filled hour spine
        |(absence is a 0 observation — correlation over different
        |supports is meaningless), the covariance numerator
        |num = n*Sxy - Sx*Sy, its sign, and r^2 in ppm =
        |1e6*num^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2)) — the QUOTIENT is
        |<= 1e6 by Cauchy-Schwarz, and the intermediates (which that
        |bound does NOT cover) are overflow-guarded by the shared
        |r2PpmExpr template: the exact branch while |num| <= 3e15, the
        |identically-quantized /n rescale past it, valid to n*C^2 <=
        |3e15 (see r2PpmExpr's scaladoc for the bounds; cov_num's raw
        |BIGINT cast is additionally valid to n*C <= 3e9). Products
        |ride DECIMAL(38,0)/HUGEINT; constant series report r2 = 0 via
        |the greatest(...,1) denominator guard (the q244
        |zero-denominator convention). sign + r^2 carry everything r
        |does without a cross-engine sqrt.
        |Scale shape: one (type, hour) count with map-side combine,
        |a wall-clock-bounded dense spine, a |types|^2 x |hours|
        |census self-join on hour, five integer moments per pair.""".stripMargin,
      s"""WITH c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        |ty AS (SELECT DISTINCT event_type FROM c),
        |sp AS (SELECT ty.event_type, g.h
        |       FROM ty CROSS JOIN
        |         (SELECT unnest(generate_series(b.h0, b.h1)) AS h FROM b) g),
        |z AS (SELECT sp.event_type, sp.h, COALESCE(c.cnt, 0) AS cnt
        |      FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |p AS (
        |  SELECT a.event_type AS type_a, b2.event_type AS type_b,
        |    count(*)::BIGINT AS n,
        |    CAST(sum(a.cnt) AS BIGINT) AS sx, CAST(sum(b2.cnt) AS BIGINT) AS sy,
        |    CAST(sum(a.cnt * b2.cnt) AS BIGINT) AS sxy,
        |    CAST(sum(a.cnt * a.cnt) AS BIGINT) AS sxx,
        |    CAST(sum(b2.cnt * b2.cnt) AS BIGINT) AS syy
        |  FROM z a JOIN z b2 ON a.h = b2.h AND a.event_type < b2.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n,
        |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT) AS cov_num,
        |  CASE WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy > 0 THEN 1
        |       WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy < 0 THEN -1
        |       ELSE 0 END AS cov_sign,
        |  $r2PpmDuck AS r2_ppm
        |FROM p""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .transform(graft.Graft.stagedCheckpoint) // bounds, types, grid
      val b = c.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val ty = c.select(col("event_type")).distinct()
      val sp = ty.crossJoin(broadcast(
        b.select(explode(sequence(col("h0"), col("h1"))).as("h"))))
      val z = sp.join(c, Seq("event_type", "h"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .transform(graft.Graft.stagedCheckpoint) // self-joined a x b
      val a = z.select(col("h"), col("event_type").as("type_a"), col("cnt").as("ca"))
      val b2 = z.select(col("h"), col("event_type").as("type_b"), col("cnt").as("cb"))
      a.join(b2, Seq("h"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("ca")).cast("bigint").as("sx"),
          sum(col("cb")).cast("bigint").as("sy"),
          sum(col("ca") * col("cb")).cast("bigint").as("sxy"),
          sum(col("ca") * col("ca")).cast("bigint").as("sxx"),
          sum(col("cb") * col("cb")).cast("bigint").as("syy"))
        .select(col("type_a"), col("type_b"), col("n"),
          expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
            .cast("bigint").as("cov_num"),
          expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * sxy
                 |          - CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN 1
                 |     WHEN CAST(n AS DECIMAL(38,0)) * sxy
                 |          - CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN -1
                 |     ELSE 0 END""".stripMargin).cast("bigint").as("cov_sign"),
          expr(r2PpmSpark).as("r2_ppm"))
    },

    // ------------------------------------------------------------------
    q("q281_holt_linear",
      """Holt's linear-trend exponential smoothing per event type over
        |the zero-filled hourly series (Holt 1957, reprinted IJF 2004;
        |Hyndman & Athanasopoulos fpp3 §8.2) — the level+trend
        |forecaster between q225's EWMA (level only) and a full
        |seasonal model (q240 profiles the seasonality separately).
        |alpha = beta = 1/4 make every update a dyadic integer step:
        |l' = (1000y + 3(l+b)) // 4, b' = ((l'-l) + 3b) // 4, with the
        |division TRUNCATING toward zero in both engines (Java long /
        |in the Scala kernel; DuckDB's integer // truncates too) so
        |negative trends cannot diverge. Census per type: hours, final
        |level/trend, next-hour
        |forecast, total and mean |1-step error| — the in-sample
        |forecastability number (a type q227's changepoints rule is
        |trending smoothly iff mae is small relative to level).
        |Scale shape: the recurrence is state-dependent (NOT a prefix
        |sum) and runs as q259's discipline — ONE hash shuffle of the
        |wall-clock-bounded spine, spill-safe local sort, O(1) state
        |per type via HoltState.step, shared verbatim with streaming
        |kernel #19 (StreamHolt).""".stripMargin,
      """WITH RECURSIVE c AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |sp AS (
        |  SELECT event_type, unnest(generate_series(h0, h1)) AS h
        |  FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
        |        FROM c GROUP BY 1)),
        |z AS (
        |  SELECT sp.event_type, sp.h, COALESCE(c.cnt, 0) AS cnt,
        |    row_number() OVER (PARTITION BY sp.event_type ORDER BY sp.h) AS rn
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |r AS (
        |  SELECT event_type, rn, 1000 * cnt AS l, CAST(0 AS BIGINT) AS b,
        |    CAST(0 AS BIGINT) AS sae
        |  FROM z WHERE rn = 1
        |  UNION ALL
        |  SELECT z.event_type, z.rn,
        |    (1000 * z.cnt + 3 * (r.l + r.b)) // 4,
        |    (((1000 * z.cnt + 3 * (r.l + r.b)) // 4) - r.l + 3 * r.b) // 4,
        |    r.sae + abs(1000 * z.cnt - (r.l + r.b))
        |  FROM r JOIN z ON z.event_type = r.event_type AND z.rn = r.rn + 1),
        |f AS (SELECT event_type, max(rn) AS n FROM z GROUP BY 1)
        |SELECT f.event_type, CAST(f.n AS BIGINT) AS n_hours,
        |  r.l AS level_milli, r.b AS trend_milli,
        |  r.l + r.b AS forecast_milli, r.sae AS sae_milli,
        |  r.sae // greatest(f.n - 1, 1) AS mae_milli
        |FROM f JOIN r ON r.event_type = f.event_type AND r.rn = f.n""".stripMargin) { (s, dir) =>
      val sp = s
      import sp.implicits._
      EventsOps.hourlySpineOf(Tables.events(s, dir))
        .select(col("event_type"), col("h").cast("long"), col("cnt").cast("long"))
        .as[(String, Long, Long)]
        .repartition(col("event_type"))
        .sortWithinPartitions(col("event_type"), col("h"))
        .mapPartitions { iter =>
          // one HoltState per type run — emit on type change / end
          val out = Vector.newBuilder[(String, Long, Long, Long, Long, Long, Long)]
          var cur: String = null
          var st = HoltState.empty
          def close(): Unit = if (cur != null) {
            out += ((cur, st.n, st.l, st.b, st.l + st.b, st.sae,
              st.sae / math.max(st.n - 1L, 1L)))
          }
          iter.foreach { case (t, _, y) =>
            if (t != cur) { close(); cur = t; st = HoltState.empty }
            st = st.step(y)
          }
          close()
          out.result().iterator
        }
        .toDF("event_type", "n_hours", "level_milli", "trend_milli",
          "forecast_milli", "sae_milli", "mae_milli")
    },

    // ------------------------------------------------------------------
    q("q287_classical_decomposition",
      """Classical additive seasonal decomposition of the hourly series
        |(Hyndman & Athanasopoulos fpp3 §3.4 — the moving-average
        |method STL refines): trend = the centered 2x24-hour moving
        |average (the average of the [-12,11] and [-11,12] sliding
        |sums — exact: milli = 1000*(s1+s2) // 48, emitted only where
        |BOTH frames hold a full 24 hours, the textbook edge rule),
        |detrended = 1000*cnt - trend, and the seasonal index per
        |hour-of-day = the mean detrended value, CENTERED by the
        |per-type mean so indices sum to ~0 (exactly 0 up to the two
        |truncating divisions, both spelled sign-symmetrically in both
        |engines). This is the chart that separates "traffic grows"
        |from "traffic peaks at 19:00" — q281's trend state and q240's
        |raw hour-of-day profile, unified in one decomposition.
        |Scale shape: everything runs on the zero-filled spine
        |(wall-clock-bounded, replica-invariant); the windows partition
        |by type with 24-row frames; output is |types| x 24 rows.""".stripMargin,
      """WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT event_type, unnest(generate_series(h0, h1)) AS h
        |  FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
        |        FROM c GROUP BY 1)),
        |z AS (SELECT sp.event_type, sp.h, COALESCE(c.cnt, 0) AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |tr AS (
        |  SELECT event_type, h, cnt,
        |    CAST(sum(cnt) OVER w1 AS BIGINT) AS s1, count(*) OVER w1 AS n1,
        |    CAST(sum(cnt) OVER w2 AS BIGINT) AS s2, count(*) OVER w2 AS n2
        |  FROM z
        |  WINDOW w1 AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
        |         w2 AS (PARTITION BY event_type ORDER BY h
        |                ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
        |dt AS (
        |  SELECT event_type, h % 24 AS hod,
        |    1000 * cnt - (1000 * (s1 + s2)) // 48 AS d
        |  FROM tr WHERE n1 = 24 AND n2 = 24),
        |sr AS (
        |  SELECT event_type, hod, count(*)::BIGINT AS n_obs,
        |    CAST(CASE WHEN sum(d) >= 0 THEN sum(d) // count(*)
        |         ELSE -((-sum(d)) // count(*)) END AS BIGINT) AS s_raw
        |  FROM dt GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    CAST(CASE WHEN sum(s_raw) >= 0 THEN sum(s_raw) // count(*)
        |         ELSE -((-sum(s_raw)) // count(*)) END AS BIGINT) AS s_mean
        |  FROM sr GROUP BY 1)
        |SELECT sr.event_type, sr.hod, sr.n_obs, sr.s_raw,
        |  sr.s_raw - m.s_mean AS seasonal_milli
        |FROM sr JOIN m USING (event_type)""".stripMargin) { (s, dir) =>
      val z = EventsOps.hourlySpineOf(Tables.events(s, dir))
      val w1 = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-12, 11)
      val w2 = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(-11, 12)
      val dt = z
        .withColumn("s1", sum(col("cnt")).over(w1).cast("long"))
        .withColumn("n1", count(lit(1)).over(w1))
        .withColumn("s2", sum(col("cnt")).over(w2).cast("long"))
        .withColumn("n2", count(lit(1)).over(w2))
        .filter(col("n1") === 24 && col("n2") === 24)
        .select(col("event_type"), (col("h") % 24).as("hod"),
          (lit(1000L) * col("cnt") -
            expr("(1000 * (s1 + s2)) DIV 48")).as("d"))
      val sr = dt.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).cast("bigint").as("n_obs"),
          expr("""CAST(CASE WHEN sum(d) >= 0 THEN sum(d) DIV count(1)
                 |ELSE -((-sum(d)) DIV count(1)) END AS BIGINT)""".stripMargin)
            .as("s_raw"))
        .transform(graft.Graft.stagedCheckpoint) // centering agg + final join
      val m = sr.groupBy(col("event_type"))
        .agg(expr("""CAST(CASE WHEN sum(s_raw) >= 0 THEN sum(s_raw) DIV count(1)
                    |ELSE -((-sum(s_raw)) DIV count(1)) END AS BIGINT)""".stripMargin)
          .as("s_mean"))
      sr.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"), col("hod"), col("n_obs"), col("s_raw"),
          (col("s_raw") - col("s_mean")).as("seasonal_milli"))
    },

    // ------------------------------------------------------------------
    q("q288_lead_lag",
      """Lead-lag detection between event-type hourly series — q280's
        |cross-correlation swept over lags -6..+6 (Box & Jenkins'
        |cross-correlation function, the "which metric moves FIRST"
        |question every incident postmortem asks): for each ordered
        |type pair, the exact r^2 ppm at every lag (q280's
        |overflow-guarded integer formula — the shared r2PpmExpr
        |template and its validity bounds — on the lag-shifted
        |spine join), then the best lag picked DETERMINISTICALLY —
        |max r^2, ties broken toward the smallest lag — alongside the
        |lag-0 r^2 so the reader sees the lead-lag GAIN. A negative
        |best lag with positive sign means type_a's series leads
        |type_b's. Overlap shrinks by |lag| at the spine edges (the
        |standard CCF truncation), so each lag's moments use its own
        |n. Scale shape: the lag sweep multiplies q280's census join
        |by 13 — still spine-bounded; the pick is two tiny aggregates
        |over the |pairs| x 13 result.""".stripMargin,
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM c),
        |ty AS (SELECT DISTINCT event_type FROM c),
        |sp AS (SELECT ty.event_type, g.h FROM ty CROSS JOIN
        |  (SELECT unnest(generate_series(b.h0, b.h1)) AS h FROM b) g),
        |z AS (SELECT sp.event_type, sp.h, COALESCE(c.cnt, 0) AS cnt
        |  FROM sp LEFT JOIN c ON c.event_type = sp.event_type AND c.h = sp.h),
        |lags AS (SELECT CAST(unnest(generate_series(-6, 6)) AS BIGINT) AS lag),
        |p AS (
        |  SELECT a.event_type AS type_a, b2.event_type AS type_b, lags.lag,
        |    count(*)::BIGINT AS n,
        |    CAST(sum(a.cnt) AS BIGINT) AS sx, CAST(sum(b2.cnt) AS BIGINT) AS sy,
        |    CAST(sum(a.cnt * b2.cnt) AS BIGINT) AS sxy,
        |    CAST(sum(a.cnt * a.cnt) AS BIGINT) AS sxx,
        |    CAST(sum(b2.cnt * b2.cnt) AS BIGINT) AS syy
        |  FROM lags
        |  JOIN z a ON TRUE
        |  JOIN z b2 ON b2.h = a.h + lags.lag AND a.event_type < b2.event_type
        |  GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT type_a, type_b, lag, n,
        |    CASE WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy > 0 THEN 1
        |         WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy < 0 THEN -1
        |         ELSE 0 END AS cov_sign,
        |    $r2PpmDuck AS r2_ppm
        |  FROM p),
        |mx AS (SELECT type_a, type_b, max(r2_ppm) AS r2_best FROM r GROUP BY 1, 2),
        |pick AS (SELECT r.type_a, r.type_b, min(r.lag) AS best_lag
        |  FROM r JOIN mx ON mx.type_a = r.type_a AND mx.type_b = r.type_b
        |   AND r.r2_ppm = mx.r2_best GROUP BY 1, 2),
        |l0 AS (SELECT type_a, type_b, r2_ppm AS r2_lag0 FROM r WHERE lag = 0)
        |SELECT r.type_a, r.type_b, r.lag AS best_lag, r.n AS n_overlap,
        |  r.cov_sign, r.r2_ppm AS r2_best, l0.r2_lag0
        |FROM pick
        |JOIN r ON r.type_a = pick.type_a AND r.type_b = pick.type_b
        |      AND r.lag = pick.best_lag
        |JOIN l0 ON l0.type_a = pick.type_a AND l0.type_b = pick.type_b""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .groupBy(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).cast("bigint").as("cnt"))
        .transform(graft.Graft.stagedCheckpoint) // bounds, types, grid
      val b = c.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val ty = c.select(col("event_type")).distinct()
      val sp = ty.crossJoin(broadcast(
        b.select(explode(sequence(col("h0"), col("h1"))).as("h"))))
      val z = sp.join(c, Seq("event_type", "h"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .transform(graft.Graft.stagedCheckpoint) // lag-shifted self-join
      val lags = s.range(-6, 7).select(col("id").cast("long").as("lag"))
      val a = z.select(col("event_type").as("type_a"), col("h"), col("cnt").as("ca"))
        .crossJoin(broadcast(lags))
      val b2 = z.select(col("event_type").as("type_b"),
        col("h").as("hb"), col("cnt").as("cb"))
      val r = a.join(b2, col("hb") === col("h") + col("lag") &&
          col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"), col("lag"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("ca")).cast("bigint").as("sx"),
          sum(col("cb")).cast("bigint").as("sy"),
          sum(col("ca") * col("cb")).cast("bigint").as("sxy"),
          sum(col("ca") * col("ca")).cast("bigint").as("sxx"),
          sum(col("cb") * col("cb")).cast("bigint").as("syy"))
        .select(col("type_a"), col("type_b"), col("lag"), col("n"),
          expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * sxy
                 |          - CAST(sx AS DECIMAL(38,0)) * sy > 0 THEN 1
                 |     WHEN CAST(n AS DECIMAL(38,0)) * sxy
                 |          - CAST(sx AS DECIMAL(38,0)) * sy < 0 THEN -1
                 |     ELSE 0 END""".stripMargin).cast("bigint").as("cov_sign"),
          expr(r2PpmSpark).as("r2_ppm"))
        .transform(graft.Graft.stagedCheckpoint) // mx, pick, l0, final join
      val mx = r.groupBy(col("type_a"), col("type_b"))
        .agg(max(col("r2_ppm")).as("r2_best"))
      val pick = r.join(mx, Seq("type_a", "type_b"))
        .filter(col("r2_ppm") === col("r2_best"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(min(col("lag")).as("best_lag"))
      val l0 = r.filter(col("lag") === 0)
        .select(col("type_a"), col("type_b"), col("r2_ppm").as("r2_lag0"))
      // pick derives FROM r, so joining the two through same-named
      // columns would lean on Spark's ambiguous-self-join dataset-id
      // heuristic (and log "trivially true equals predicate" WARNs) —
      // the pick side is renamed first so the equi-join is between
      // genuinely distinct attributes (VERDICT r14 #2)
      val pickR = pick.select(col("type_a").as("best_type_a"),
        col("type_b").as("best_type_b"), col("best_lag"))
      pickR.join(r, col("best_type_a") === col("type_a") &&
          col("best_type_b") === col("type_b") && col("best_lag") === col("lag"))
        .select(col("type_a"), col("type_b"), col("best_lag"),
          col("n").as("n_overlap"), col("cov_sign"),
          col("r2_ppm").as("r2_best"))
        .join(l0, Seq("type_a", "type_b"))
    })
}
