package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond cleaning/dedup: the steps
  * between a curated corpus and a training run.
  *
  *   - q81 deterministic stratified sampling: hash-gate per stratum —
  *     reproducible across reruns, partitionings and cluster sizes,
  *     which seeded rand() is NOT (Spark reseeds per partition); and a
  *     pure scan-side filter, no shuffle, no driver coordination.
  *   - q82 vocabulary coverage: token counts + cumulative coverage —
  *     what a tokenizer-vocab build actually reads.
  *   - q83 sequence construction: per-user chronological event paths,
  *     the input shape of sequence-model training examples.
  *   - q84 snapshot CDC: diff of two materialization cutoffs, the
  *     incremental-refresh primitive for any derived training table.
  *   - q85 equi-depth histogram: exact ntile formulation — the oracle
  *     for the sketch tier (q40/q43 approx percentiles) and the
  *     feature-binning step of numeric-column preprocessing.
  */
object TrainingOps {

  // Same affine-hash family as q80, different constants: the gate must
  // be cheap, cross-engine identical, and uncorrelated with the data.
  private val P = 2147483647L

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q81_stratified_sample",
      """Deterministic stratified downsampling: keep a per-language
        |fraction (10% of dominant 'en', 50% elsewhere — corpus
        |rebalancing) by gating on an affine hash of doc_id, not on
        |rand(). The gate is a pure scalar predicate: it pushes into the
        |scan, shuffles nothing, and yields the SAME sample on any
        |cluster size or retry — seeded rand() cannot promise that
        |(Spark seeds per partition, so the sample changes with the
        |partitioning). Emits per-lang totals and sampled counts.""".stripMargin,
      s"""SELECT lang, count(*) AS n_total,
        |  CAST(sum(CASE WHEN ((31 * doc_id + 7) % $P) % 1000 <
        |                     (CASE WHEN lang = 'en' THEN 100 ELSE 500 END)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      val gate = ((lit(31L) * col("doc_id") + 7L) % P) % 1000 <
        when(col("lang") === "en", 100).otherwise(500)
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(gate, 1L).otherwise(0L)).cast("bigint").as("n_sampled"))
    },

    // ----------------------------------------------------------------
    q("q82_vocab_coverage",
      """Tokenizer-vocab build: whitespace tokens, counts, rank by
        |(count desc, token), cumulative token coverage via a window
        |running sum. The explode+count is one shuffle with map-side
        |combine (token cardinality, not corpus size); the top-20 window
        |runs on the tiny count table. All-integer output — no float
        |division to drift. cum_cnt/total_cnt answers "how big a vocab
        |covers X% of the corpus".""".stripMargin,
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tc AS (
        |  SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok),
        |ranked AS (
        |  SELECT tok, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
        |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS total_cnt
        |  FROM tc)
        |SELECT rk, tok, cnt, cum_cnt, total_cnt
        |FROM ranked WHERE rk <= 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tc = Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val ord = Window.orderBy(col("cnt").desc, col("tok"))
      tc.withColumn("rk", row_number().over(ord))
        .withColumn("cum_cnt",
          sum(col("cnt")).over(ord.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"))
        .withColumn("total_cnt",
          sum(col("cnt")).over(Window.partitionBy()).cast("bigint"))
        .filter(col("rk") <= 20)
        .select(col("rk"), col("tok"), col("cnt"), col("cum_cnt"), col("total_cnt"))
    },

    // ----------------------------------------------------------------
    q("q83_user_sequences",
      """Sequence-example construction: each user's chronological
        |event-type path as one training row. collect_list(struct) +
        |array_sort gives a deterministic order — (ts, event_id) is a
        |total order per user — then the path folds to a string. One
        |shuffle on user_id; per-user state is the user's own history
        |(the natural contract for sequence examples; a pathological
        |key would be capped with slice() before the fold). Top-10
        |busiest users keeps the output bounded and the selection
        |deterministic.""".stripMargin,
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, '->' ORDER BY ts, event_id) AS path
        |FROM events
        |GROUP BY user_id
        |ORDER BY n_events DESC, user_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          array_join(
            expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
            "->").as("path"))
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(10)
    },

    // ----------------------------------------------------------------
    q("q84_snapshot_cdc",
      """Snapshot CDC: per-user aggregate state materialized at the data
        |midpoint (T1) vs the full range (T2), diffed into
        |insert/update/unchanged classes — the incremental-refresh
        |primitive for derived tables (append-only input, so no
        |deletes). The diff is a left join of the two aggregates on the
        |key — co-partitioned by the same groupBy key, so AQE plans it
        |without an extra exchange; at 100 TB both snapshots would be
        |bucketed by user_id and the join stays shuffle-free.""".stripMargin,
      """WITH b AS (
        |  SELECT epoch_us(ts) AS t, user_id, event_type FROM events),
        |r AS (SELECT min(t) AS lo, max(t) AS hi FROM b),
        |s1 AS (
        |  SELECT user_id, event_type, count(*) AS n FROM b, r
        |  WHERE t <= lo + (hi - lo) // 2 GROUP BY user_id, event_type),
        |s2 AS (SELECT user_id, event_type, count(*) AS n
        |       FROM b GROUP BY user_id, event_type),
        |d AS (
        |  SELECT s2.user_id,
        |    CASE WHEN s1.user_id IS NULL THEN 'insert'
        |         WHEN s1.n <> s2.n THEN 'update'
        |         ELSE 'unchanged' END AS change_type
        |  FROM s2 LEFT JOIN s1 USING (user_id, event_type))
        |SELECT change_type, count(*) AS n_keys
        |FROM d GROUP BY change_type""".stripMargin) { (s, dir) =>
      val b = Tables.events(s, dir)
        .select(unix_micros(col("ts")).as("t"), col("user_id"), col("event_type"))
      val r = b.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      // lo + (hi-lo) DIV 2: non-negative epochs, so truncating DIV ==
      // floor == DuckDB's // (same domain note as Fns.bucketS)
      val s1 = b.crossJoin(broadcast(r))
        .filter(col("t") <= col("lo") + expr("(hi - lo) DIV 2"))
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n1"))
      val s2 = b.groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n2"))
      s2.join(s1, Seq("user_id", "event_type"), "left")
        .select(when(col("n1").isNull, "insert")
          .when(col("n1") =!= col("n2"), "update")
          .otherwise("unchanged").as("change_type"))
        .groupBy(col("change_type")).agg(count(lit(1)).as("n_keys"))
    },

    // ----------------------------------------------------------------
    q("q85_equidepth_hist",
      """Equi-depth (quantile) binning of a numeric feature: ntile(10)
        |over the totally-ordered (value, event_id) stream, per-bin
        |count/min/max. Raw double pass-through (no arithmetic) is
        |bit-stable cross-engine. NOTE the deliberate ladder: this exact
        |formulation needs a single-partition window sort — it is the
        |small-SF ORACLE for binning; the 100 TB path is the sketch tier
        |(q40 approx percentiles, q43 HLL/quantile) whose cutpoints this
        |query validates.""".stripMargin,
      """WITH t AS (
        |  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bin
        |  FROM events)
        |SELECT bin, count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM t GROUP BY bin""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, dir)
        .select(col("value"),
          ntile(10).over(Window.orderBy(col("value"), col("event_id"))).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
          max(col("value")).as("hi"))
    }
  )
}
