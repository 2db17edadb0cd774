package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Fns._
import org.apache.spark.sql.functions._

/** Nested-type surface: array higher-order functions, collect-to-array
  * aggregation, unpivot/melt, time-spine gap fill, and arg-max. The
  * reference's own type surface is flat (SURVEY.md §1.3), but the
  * training-data extensions (§2.11) carry array<float> embeddings, so
  * first-class array operators belong in the engine.
  */
object ArrayOps {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    q("q54_array_hof",
      """Array higher-order functions on the embedding column: per-vector
        |dimension count and L2 norm via transform + aggregate (a fused
        |codegen fold — no explode, no shuffle, no UDF). Both engines
        |fold left-to-right over the same element order, double-precision
        |from the first multiply, so the result is bit-stable.""".stripMargin,
      """SELECT vec_id, len(embedding) AS dim,
        |  sqrt(list_sum(list_transform(embedding,
        |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
        |FROM embeddings""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).cast("bigint").as("dim"),
        sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("l2"))
    },

    // ----------------------------------------------------------------
    q("q55_collect_sorted",
      """Collect-to-array aggregation with deterministic order:
        |per-event-type sorted distinct user list. collect_set is
        |order-nondeterministic under parallel merge — sort_array is what
        |makes the result reproducible (and hash-comparable) at any
        |parallelism. The array is emitted CSV-joined (sorted numerically
        |FIRST, stringified after) so the harness comparator — which sorts
        |rows with pandas and cannot hash raw arrays — sees a scalar
        |column; n_users pins the cardinality independently of the string
        |form. Cardinality contract: |users| = distinct users per type,
        |bounded by the user dimension (~10^5 here); for unbounded-key
        |audience lists at 100 TB use the join shape (q67/q74 oracle),
        |not collect.""".stripMargin,
      """SELECT event_type,
        |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          array_join(transform(sort_array(collect_set(col("user_id"))),
            u => u.cast("string")), ",").as("users"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // ----------------------------------------------------------------
    q("q56_unpivot",
      """Unpivot/melt: three lineitem measures folded into (metric, val)
        |rows, then aggregated per (returnflag, metric). Expand-based —
        |one scan, no join; the row-count 3x happens inside codegen ahead
        |of the partial aggregate, so the shuffle carries only group
        |totals.""".stripMargin,
      """SELECT l_returnflag, metric,
        |  CAST(sum(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (UNPIVOT lineitem ON l_quantity, l_extendedprice, l_discount
        |      INTO NAME metric VALUE val)
        |GROUP BY l_returnflag, metric""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .groupBy(col("l_returnflag"), col("metric"))
        .agg(dsum(col("val")).as("total"))
    },

    // ----------------------------------------------------------------
    q("q57_gapfill",
      """Time-spine gap fill: hourly event counts joined onto a complete
        |generated hour spine so silent hours surface as explicit zeros —
        |the shape every monitoring/alerting consumer needs (a missing
        |hour is a signal, not an absence). The spine is sequence+explode
        |over the [min,max] hour bounds (one tiny row), broadcast against
        |the aggregated counts — input scale only affects the first
        |aggregate.""".stripMargin,
      """WITH hc AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
        |            FROM events GROUP BY 1),
        |bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hc),
        |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        |          FROM bounds)
        |SELECT s.hr, coalesce(hc.n, 0) AS n
        |FROM spine s LEFT JOIN hc USING (hr)""".stripMargin) { (s, dir) =>
      // materialized once: hc feeds both the spine bounds and the join —
      // without the checkpoint the events scan + hour aggregate runs twice
      val hc = Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .transform(graft.Graft.stagedCheckpoint)
      val spine = hc.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("hr"))
      spine.join(hc, Seq("hr"), "left")
        .select(col("hr"), coalesce(col("cnt"), lit(0L)).as("n"))
    },

    // ----------------------------------------------------------------
    q("q74_array_setops",
      """Array set operations: per-event-type distinct-user arrays
        |(bounded — one row per type) pairwise combined with
        |array_intersect / array_except / array_union. The oracle derives
        |the same counts relationally (joins + inclusion-exclusion), so
        |the array set semantics are pinned against set algebra. The
        |array side is the scale pattern for small-cardinality audience
        |overlap; user-pair-level overlap at scale goes through joins
        |(q67's shape), not arrays.""".stripMargin,
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |n AS (SELECT event_type, count(*) AS c FROM tu GROUP BY 1),
        |common AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_common
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT c.type_a, c.type_b, c.n_common,
        |  na.c - c.n_common AS n_only_a,
        |  na.c + nb.c - c.n_common AS n_union
        |FROM common c
        |JOIN n na ON na.event_type = c.type_a
        |JOIN n nb ON nb.event_type = c.type_b""".stripMargin) { (s, dir) =>
      val arrs = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(collect_set(col("user_id")).as("us"))
      val a = arrs.select(col("event_type").as("type_a"), col("us").as("ua"))
      val b = arrs.select(col("event_type").as("type_b"), col("us").as("ub"))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          size(array_intersect(col("ua"), col("ub"))).cast("bigint").as("n_common"),
          size(array_except(col("ua"), col("ub"))).cast("bigint").as("n_only_a"),
          size(array_union(col("ua"), col("ub"))).cast("bigint").as("n_union"))
    },

    // ----------------------------------------------------------------
    q("q64_json_extract",
      """Schema-on-read JSON parsing (the S6 OpenX-JsonSerDe shape done
        |right): from_json with an explicit schema pulls typed fields out
        |of the props payload in one codegen'd expression — no regexp, no
        |UDF — then buckets on the extracted value. At scale the parse
        |cost is the scan cost; nothing shuffles until the tiny bucket
        |aggregate.""".stripMargin,
      """SELECT CAST(floor(CAST(json_extract(props, '$.k') AS INT) / 10.0) AS BIGINT) AS k_bucket,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
        // floor(k/10), not `div`: div truncates toward zero, floor rounds
        // down — they differ on negative k, and the oracle floors. Data is
        // non-negative today; floor keeps the engines aligned if that
        // domain assumption ever breaks.
        .groupBy(floor(col("k") / 10.0).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("bigint").as("k_sum"))
    },

    // ----------------------------------------------------------------
    q("q65_struct_map",
      """Struct and map construction surface: named_struct packed from
        |row values plus a map literal lookup. The struct is built as a
        |real nested value and then serialized with to_json for the
        |harness (the comparator sorts rows with pandas, which cannot
        |hash dicts); both engines render field order t,u with no
        |whitespace, and both columns are non-null in this table so the
        |null-field-omission divergence (Spark drops null JSON fields,
        |DuckDB keeps them) cannot bite. The genuinely-nested
        |writer/reader path is exercised by MultimodalSpec's parquet
        |round-trip, not here.""".stripMargin,
      """SELECT event_id,
        |  to_json({'t': event_type, 'u': user_id}) AS rec,
        |  map(['w'], [CAST(1 AS INT)])['w'][1] AS w
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("rec"),
        element_at(map_from_arrays(array(lit("w")), array(lit(1))), "w").as("w"))
    },

    // ----------------------------------------------------------------
    q("q66_safe_casts",
      """Error-safe expression surface: try_cast returns NULL instead of
        |failing the job on malformed input, try_divide absorbs
        |divide-by-zero — the difference between one bad row poisoning a
        |100 TB job and a null that the next filter handles.""".stripMargin,
      """SELECT event_id,
        |  TRY_CAST(event_type AS INT) AS et_int,
        |  TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k,
        |  CASE WHEN TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) = 0
        |       THEN NULL
        |       ELSE CAST(1 AS DOUBLE) / TRY_CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)
        |  END AS inv_k
        |FROM events""".stripMargin) { (s, dir) =>
      val k = expr("try_cast(regexp_extract(props, '[0-9]+', 0) AS bigint)")
      Tables.events(s, dir).select(
        col("event_id"),
        expr("try_cast(event_type AS int)").as("et_int"),
        k.as("k"),
        try_divide(lit(1.0), k).as("inv_k"))
    },

    // ----------------------------------------------------------------
    q("q58_argmax",
      """Arg-max aggregation: per event type, the single busiest user via
        |max_by over a (count, user) struct — struct ordering gives the
        |deterministic tie-break that bare max_by lacks. One aggregate
        |over the counts, no rank window, no second shuffle.""".stripMargin,
      """SELECT event_type, user_id AS top_user, n AS top_n FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY count(*) DESC, user_id DESC) AS rk
        |  FROM events GROUP BY event_type, user_id)
        |WHERE rk = 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_type"))
        .agg(
          max_by(col("user_id"), struct(col("n"), col("user_id"))).as("top_user"),
          max(struct(col("n"), col("user_id"))).getField("n").as("top_n"))
    })
}
