package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
        |(count desc, token), cumulative token coverage via a running
        |sum. The explode+count is one shuffle with map-side combine
        |(token cardinality, not corpus size); the top-20 selection is
        |TakeOrdered (never a global window over the full vocab — at
        |100 TB the vocab is millions of tokens and a partition-less
        |window would single-thread it); the 20 survivors collapse into
        |ONE sorted array row, so rank and the running sum are plain
        |array arithmetic (posexplode + aggregate over a slice) — zero
        |WindowExec in the plan; the corpus total is a scalar aggregate
        |broadcast back. The token-count aggregate is materialized ONCE
        |(localCheckpoint): it feeds both the total and the top-20, and
        |without it the explode+groupBy corpus pass would run twice
        |(r4 finding).
        |All-integer output — no float division to drift.
        |cum_cnt/total_cnt answers "how big a vocab covers X% of the
        |corpus".""".stripMargin,
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
      // materialized once: one explode+groupBy corpus pass feeds BOTH
      // consumers (total and top-20). localCheckpoint, not cache(): a
      // CacheManager entry would stay pinned in executor storage for
      // the whole session (nothing ever unpersists a query-local
      // frame), stealing execution memory from every later query at
      // larger SF; checkpoint blocks are freed when the plan is GC'd.
      val tc = Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .transform(graft.Graft.stagedCheckpoint)
      val total = tc.agg(sum(col("cnt")).cast("bigint").as("total_cnt"))
      // (cnt desc, tok) is a total order, so rank/running-sum restricted
      // to the TakeOrdered top 20 equals the same window over the full
      // vocab filtered to rk <= 20. The 20 survivors collapse into one
      // sorted array (struct sorts lexicographically; -cnt makes
      // ascending array order == (cnt desc, tok asc)), so rank is the
      // array position and the running sum an aggregate over a slice —
      // no WindowExec at all.
      val top = tc.orderBy(col("cnt").desc, col("tok")).limit(20)
        .select(struct((-col("cnt")).as("nc"), col("tok").as("tok"),
          col("cnt").as("cnt")).as("x"))
        .agg(sort_array(collect_list(col("x"))).as("xs"))
      top.select(col("xs"), posexplode(col("xs")))
        .select(col("xs"), (col("pos") + 1).as("rk"),
          col("col.tok").as("tok"), col("col.cnt").as("cnt"), col("pos"))
        .withColumn("cum_cnt",
          expr("CAST(aggregate(slice(xs, 1, pos + 1), CAST(0 AS BIGINT), (acc, v) -> acc + v.cnt) AS BIGINT)"))
        .crossJoin(broadcast(total))
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
      """Equi-depth (quantile) binning of a numeric feature, EXACT and
        |distributed: bin = ((rank-1)*10) DIV N + 1 over the global
        |row_number in the totally-ordered (value, event_id) stream —
        |bin sizes differ by at most 1, same equi-depth contract as
        |ntile, but the rank comes from DistributedRank (range
        |repartition + parallel per-partition sort + broadcast prefix
        |offsets), so NO single-partition window sort exists anywhere in
        |the plan — the r4 ntile formulation moved the whole table
        |through one task. Raw double pass-through (no float
        |arithmetic) stays bit-stable cross-engine; this exact
        |histogram is the oracle the sketch tier (q40/q43 approx
        |percentiles) is judged against.""".stripMargin,
      """WITH n AS (SELECT count(*) AS n_total FROM events),
        |t AS (
        |  SELECT value,
        |    CAST(((row_number() OVER (ORDER BY value, event_id) - 1) * 10)
        |         // n_total + 1 AS INT) AS bin
        |  FROM events, n)
        |SELECT bin, count(*) AS n, min(value) AS lo, max(value) AS hi
        |FROM t GROUP BY bin""".stripMargin) { (s, dir) =>
      val ranked = DistributedRank.withGlobalRank(
        Tables.events(s, dir).select(col("value"), col("event_id")),
        Seq(col("value"), col("event_id")), "rk", "n_total")
      ranked
        // non-negative operands: truncating DIV == floor == DuckDB //
        .select(col("value"),
          expr("CAST(((rk - 1) * 10) DIV n_total + 1 AS INT)").as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
          max(col("value")).as("hi"))
    },

    // ----------------------------------------------------------------
    q("q87_keyword_search",
      """Keyword retrieval over the corpus: per-document term frequency
        |x inverse document frequency, top-10 by score. The idf is
        |INTEGER-exact — (N * 1e6) DIV df, floor division on bigints —
        |instead of a float log: same ranking family, but every score is
        |a bigint both engines compute identically (a float-log idf
        |would hash-compare at the mercy of libm ulps; see the verify
        |skill's decimal notes). One scan computes all tf columns
        |(codegen'd array filters, no explode), the tiny df/N frame
        |broadcasts back, scoring is scan-side arithmetic — at 100 TB
        |this is scan + broadcast + TakeOrdered, no shuffle of the
        |corpus.""".stripMargin,
      """WITH tf AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'join'))   AS tf_join,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'spark'))  AS tf_spark,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'window')) AS tf_window
        |  FROM documents),
        |df AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)   AS df_join,
        |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END)  AS df_spark,
        |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
        |  FROM tf)
        |SELECT doc_id,
        |  CAST(tf_join * ((n * 1000000) // greatest(df_join, 1))
        |     + tf_spark * ((n * 1000000) // greatest(df_spark, 1))
        |     + tf_window * ((n * 1000000) // greatest(df_window, 1)) AS BIGINT) AS score
        |FROM tf, df
        |ORDER BY score DESC, doc_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val terms = Seq("join", "spark", "window")
      val tf = Tables.documents(s, dir).select(
        col("doc_id") +:
          terms.map(t => size(expr(
            s"filter(split(lower(text), ' '), x -> x = '$t')")).cast("long")
            .as(s"tf_$t")): _*)
      val dfCols: Seq[org.apache.spark.sql.Column] = count(lit(1)).as("n") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
      val df = tf.agg(dfCols.head, dfCols.tail: _*)
      val scored = tf.crossJoin(broadcast(df))
        .select(col("doc_id"),
          // greatest(df,1): a term present in zero docs would otherwise
          // DIV-by-zero under ANSI mode (tf is 0 there, so the guarded
          // idf constant never contributes to any score).
          terms.map(t => col(s"tf_$t") *
            expr(s"(n * 1000000) DIV greatest(df_$t, 1)")).reduce(_ + _).cast("bigint")
            .as("score"))
      scored.orderBy(col("score").desc, col("doc_id")).limit(10)
    },

    // ----------------------------------------------------------------
    q("q88_negative_sampling",
      """Deterministic negative sampling (recsys/contrastive training):
        |for each customer with purchases, derive 3 candidate part keys
        |from an affine hash of (customer, slot) and keep those NOT in
        |the positive set — reproducible on any cluster (no rand()),
        |candidates generated scan-side, and the anti-join runs on the
        |same (cust, part) key the positive set is already grouped by.
        |First 50 (customer, slot) pairs keep the output bounded.""".stripMargin,
      """WITH pos AS (
        |  SELECT DISTINCT o_custkey AS cust, l_partkey AS part
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |mp AS (SELECT max(p_partkey) AS maxp FROM part),
        |cand AS (
        |  SELECT c.cust, j.j,
        |    ((31 * c.cust + 1009 * j.j) % 2147483647) % mp.maxp + 1 AS cand_part
        |  FROM (SELECT DISTINCT o_custkey AS cust FROM orders) c
        |  CROSS JOIN (VALUES (1), (2), (3)) AS j(j)
        |  CROSS JOIN mp),
        |neg AS (
        |  SELECT c.cust, c.j, c.cand_part FROM cand c
        |  LEFT JOIN pos p ON p.cust = c.cust AND p.part = c.cand_part
        |  WHERE p.cust IS NULL)
        |SELECT cust AS o_custkey, j AS slot, cand_part
        |FROM neg ORDER BY o_custkey, j LIMIT 50""".stripMargin) { (s, dir) =>
      val pos = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        .distinct()
      val mp = Tables.part(s, dir).agg(max(col("p_partkey")).as("maxp"))
      // candidate custs come from orders ALONE (not from pos): deriving
      // them from pos would plan the orders⋈lineitem join twice. A cust
      // with an order but no lineitem would get candidates the anti-join
      // can't veto — still valid negatives by definition.
      val cand = Tables.orders(s, dir).select(col("o_custkey").as("cust")).distinct()
        .select(col("cust"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"))
        .crossJoin(broadcast(mp))
        .select(col("cust"), col("j"),
          (((lit(31L) * col("cust") + lit(1009L) * col("j")) % 2147483647L)
            % col("maxp") + 1L).as("cand_part"))
      cand.join(pos,
          cand("cust") === pos("cust") && cand("cand_part") === pos("part"),
          "left_anti")
        .select(col("cust").as("o_custkey"), col("j").as("slot"), col("cand_part"))
        .orderBy(col("o_custkey"), col("slot")).limit(50)
    },

    // ----------------------------------------------------------------
    q("q99_sequence_packing",
      """Sequence packing for pretraining batches: concatenate the
        |corpus in doc_id order and cut it into fixed 512-token
        |sequences, reporting each document's global token offset, the
        |sequence it starts in, and whether it straddles a boundary —
        |the layout step between a curated corpus and a token-packed
        |training shard. The global offset is an INCLUSIVE prefix sum
        |over a total order, which naively is a partition-less window
        |(one task sorts the corpus); here it runs through
        |DistributedRank.withGlobalPrefixSumDense — doc_id is dense, so
        |the partition id is pure arithmetic (no range sampler, no
        |checkpoint materialization), per-bucket LOCAL running sums run
        |in parallel, and triangular offsets of the npart-row totals
        |complete the global value. One data-wide shuffle total; the
        |plan never funnels the corpus through one task. The oracle is
        |DuckDB's plain cumulative window, pinning the distributed
        |prefix sum exactly.""".stripMargin,
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum,
        |    CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  cum - n_tokens AS start_offset,
        |  (cum - n_tokens) // 512 AS seq_id,
        |  CAST(CASE WHEN (cum - n_tokens) // 512 <> (cum - 1) // 512
        |       THEN 1 ELSE 0 END AS BIGINT) AS crosses_boundary,
        |  total_tokens
        |FROM c""".stripMargin) { (s, dir) =>
      val SeqLen = 512
      val t = Tables.documents(s, dir)
        .select(col("doc_id"),
          coalesce(size(split(col("text"), " ")).cast("long"), lit(0L)).as("n_tokens"))
      DistributedRank.withGlobalPrefixSumDense(t, col("doc_id"),
          col("n_tokens"), "cum", "total_tokens")
        // integer `div`, not `/`: double division drifts above 2^53
        // total tokens, exactly the regime this operator exists for
        .select(col("doc_id"), col("n_tokens"),
          (col("cum") - col("n_tokens")).as("start_offset"),
          expr(s"(cum - n_tokens) div $SeqLen").as("seq_id"),
          expr(s"CAST((cum - n_tokens) div $SeqLen <> (cum - 1) div $SeqLen AS BIGINT)")
            .as("crosses_boundary"),
          col("total_tokens"))
    },

    // ----------------------------------------------------------------
    q("q125_bm25",
      """BM25 retrieval scoring — q87's tf-idf plus the two things BM25
        |actually adds: tf SATURATION (a term's 50th occurrence is worth
        |almost nothing more than its 10th) and DOCUMENT-LENGTH
        |normalization (a hit in a short doc outranks the same hit in a
        |long one). score = Σ_t idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/
        |avgdl)) with the standard k1=1.2, b=0.75. Both are rational, so
        |the whole formula runs in exact bigint fixed-point: multiplying
        |the saturation fraction through by 10*sumdl (avgdl = sumdl/n)
        |gives 22*tf*sumdl / (10*tf*sumdl + 3*sumdl + 9*dl*n), scaled
        |1e6 before the floor-divide; idf is q87's integer family
        |(n*100 div df). Every score is a bigint both engines compute
        |identically — no libm, no float ulps (the fixed-point widths
        |cover the test envelope; a real 100 TB deployment would score
        |in doubles since ranking tolerates ulps — it is the ORACLE that
        |demands exactness). Same scale shape as q87: one scan computes
        |all tf columns + dl (codegen array filters, no explode), the
        |one-row stats frame broadcasts back, scoring is scan-side
        |arithmetic, TakeOrdered(10) — the corpus never shuffles.""".stripMargin,
      """WITH tf AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'join'))   AS tf_join,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'spark'))  AS tf_spark,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'window')) AS tf_window
        |  FROM documents),
        |st AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
        |    sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)   AS df_join,
        |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END)  AS df_spark,
        |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
        |  FROM tf)
        |SELECT doc_id,
        |  CAST(((n * 100) // greatest(df_join, 1))
        |         * ((22 * tf_join * sumdl * 1000000)
        |            // (10 * tf_join * sumdl + 3 * sumdl + 9 * dl * n))
        |     + ((n * 100) // greatest(df_spark, 1))
        |         * ((22 * tf_spark * sumdl * 1000000)
        |            // (10 * tf_spark * sumdl + 3 * sumdl + 9 * dl * n))
        |     + ((n * 100) // greatest(df_window, 1))
        |         * ((22 * tf_window * sumdl * 1000000)
        |            // (10 * tf_window * sumdl + 3 * sumdl + 9 * dl * n))
        |    AS BIGINT) AS score
        |FROM tf, st
        |ORDER BY score DESC, doc_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val terms = Seq("join", "spark", "window")
      val tf = Tables.documents(s, dir).select(
        col("doc_id") +:
          size(split(lower(col("text")), " ")).cast("long").as("dl") +:
          terms.map(t => size(expr(
            s"filter(split(lower(text), ' '), x -> x = '$t')")).cast("long")
            .as(s"tf_$t")): _*)
      val statCols: Seq[org.apache.spark.sql.Column] =
        count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
          terms.map(t =>
            sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
      val st = tf.agg(statCols.head, statCols.tail: _*)
      tf.crossJoin(broadcast(st))
        .select(col("doc_id"),
          terms.map(t => expr(
            // greatest(df,1): a term in zero docs would DIV-by-zero
            // under ANSI mode (its tf is 0 everywhere, so the guarded
            // idf never reaches any score); the saturation denominator
            // is always positive (sumdl >= dl >= 1 per the splitter)
            s"""((n * 100) DIV greatest(df_$t, 1))
               | * ((22 * tf_$t * sumdl * 1000000)
               |    DIV (10 * tf_$t * sumdl + 3 * sumdl + 9 * dl * n))""".stripMargin))
            .reduce(_ + _).cast("bigint").as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
    },

    // ----------------------------------------------------------------
    QueryDef.q("q129_bpe_train",
      """Distributed BPE tokenizer training surfaced through the query
        |contract: learn 10 merges over the documents corpus and emit
        |the ordered merge table (rank, left, right, pair_count).
        |Correctness is pinned twice: BpeTrainerSpec's property test
        |against the in-memory reference trainer, and a DuckDB oracle
        |that unrolls all 10 merge rounds in SQL (the q131 PageRank
        |precedent). The oracle's trick for the non-SQL-shaped step —
        |left-to-right NON-OVERLAPPING merge application — is to render
        |each word as individually bracketed symbols chr(1)sym chr(2)…
        |so that plain `replace()` (itself left-to-right,
        |non-overlapping, and resuming AFTER each replacement) applies
        |the winning merge with exactly BPE semantics; adjacent matches
        |share no characters, so nothing is missed. The corpus is pure
        |ASCII (verified), so the control-char brackets and DuckDB's
        |codepoint regex vs Scala's UTF-16 chars are both safe. Scale
        |shape per BpeTrainer's scaladoc: the corpus is scanned ONCE
        |into a word-frequency histogram; all rounds run over the
        |bounded vocabulary table with a single-row collect each — the
        |driver holds O(k) merge decisions, never data.""".stripMargin,
      bpeOracleSql(10)) { (s, dir) =>
      import scala.jdk.CollectionConverters._
      val merges = BpeTrainer.train(
        Tables.documents(s, dir).select(col("text")), "text", 10)
      val rows = merges.zipWithIndex.map { case (m, i) =>
        org.apache.spark.sql.Row(i + 1L, m.left, m.right, m.count)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("left",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("right",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("pair_count",
          org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(rows.asJava, schema)
    },

    // ----------------------------------------------------------------
    q("q135_bigram_lm_score",
      """Corpus-LM fluency scoring — the model-based quality filter a
        |pretraining pipeline runs after the rule-based tier (q23
        |ratios, q91 repetition, q128 diversity): train a bigram
        |language model on the corpus itself, then score every document
        |by its mean conditional bigram probability. Degenerate or
        |shuffled text scores low because its word transitions are rare
        |in the corpus; formulaic text scores high. All arithmetic is
        |integer fixed-point (probabilities scaled by 1e6, floor
        |divides) so both engines agree bit-for-bit — the perplexity
        |log is deliberately replaced by the mean-probability form,
        |which ranks the same direction without transcendentals. Scale
        |shape: per-doc bigram counts are built scan-side (zip_with on
        |the split array, no join) and session-cached as the shared
        |docBigrams frame (they feed both the model build and the
        |scoring join here, and the whole n-gram tier — q203, q204,
        |q248 — fits its models on the same staged table; at 100 TB
        |this is the tokenize-once derived table); the
        |model is two vocab-sized hash aggs (bigram counts, then left
        |context totals derived from them — the corpus is NOT re-read);
        |scoring is a bigram-keyed equi-join plus one per-doc agg. No
        |window, no driver data.""".stripMargin,
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |i AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM w),
        |db AS (SELECT doc_id, a, b, count(*)::BIGINT AS k FROM i GROUP BY 1, 2, 3),
        |pair AS (SELECT a, b, CAST(sum(k) AS BIGINT) AS cab FROM db GROUP BY 1, 2),
        |lft AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM pair GROUP BY 1)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
        |  CAST(CAST(sum(k * ((cab * 1000000) // ca)) AS BIGINT)
        |       // CAST(sum(k) AS BIGINT) AS BIGINT) AS lm_score
        |FROM db JOIN pair USING (a, b) JOIN lft USING (a)
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      // the model join is the session-staged lmScored frame (shared
      // with q204); this projection is arithmetic-identical to the
      // old inline plan — nb/sp aggregate over the same rows, the
      // extra lang grouping key is a function of doc_id
      lmScored(s, dir).select(col("doc_id"), col("nb").as("n_bigrams"),
        expr("sp DIV nb").cast("bigint").as("lm_score"))
    },

    // ----------------------------------------------------------------
    q("q248_kneser_ney",
      """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
        |Chen & Goodman 1999 §3's interpolated form) — the smoothing
        |family CCNet's actual filter model uses (KenLM, Heafield 2011;
        |Wenzek et al. 2020 §3.3), where q135 is the add-nothing MLE
        |and q203's DSIR uses add-one: absolute discount D = 3/4 moves
        |mass from observed bigrams to the CONTINUATION unigram
        |(how many distinct left contexts a word follows — the "San
        |Francisco" correction: frequent-but-predictable words stop
        |looking fluent). P(b|a) = (c(ab) - D)/c(a) + D·N1+(a·)/c(a) ·
        |N1+(·b)/N1+(··), cleared of fractions by x4 and the bigram-
        |type total V: p_permillion = 1e6·((4·cab - 3)·V + 3·n1a·n1b)
        |DIV (4·ca·V) — exact BIGINT in both engines (widths: cab·V·1e6
        |needs cab·V < 9e12; at petabyte corpora rescale the 1e6 stage
        |like q203's bound note). Docs score by the count-weighted mean
        |(q135's transcendental-free move); every doc bigram is in the
        |corpus model by construction, so there is no unseen-mass
        |branch to diverge on. Scale shape: the SAME session-cached
        |per-doc bigram table as q135 (docBigrams, one corpus scan for
        |the whole n-gram tier); the
        |model adds exactly two vocab-sized aggs to q135's (right-
        |context distinct = a row count on pair, continuation counts
        |likewise) and a 1-row V broadcast; scoring is the same
        |bigram-keyed equi-join + per-doc agg. No window, no driver
        |data.""".stripMargin,
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |i AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM w),
        |db AS (SELECT doc_id, a, b, count(*)::BIGINT AS k FROM i GROUP BY 1, 2, 3),
        |pair AS (SELECT a, b, CAST(sum(k) AS BIGINT) AS cab FROM db GROUP BY 1, 2),
        |lft AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca,
        |          count(*)::BIGINT AS n1a FROM pair GROUP BY 1),
        |cont AS (SELECT b, count(*)::BIGINT AS n1b FROM pair GROUP BY 1),
        |vv AS (SELECT count(*)::BIGINT AS v FROM pair)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
        |  CAST(CAST(sum(k * ((1000000 * ((4 * cab - 3) * v + 3 * n1a * n1b))
        |                     // (4 * ca * v))) AS BIGINT)
        |       // CAST(sum(k) AS BIGINT) AS BIGINT) AS kn_score
        |FROM db JOIN pair USING (a, b) JOIN lft USING (a)
        |  JOIN cont USING (b) CROSS JOIN vv
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val db = docBigrams(s, dir)
        .select(col("doc_id"), col("a"), col("b"), col("k"))
      val pair = db.groupBy(col("a"), col("b")).agg(sum(col("k")).as("cab"))
      val lft = pair.groupBy(col("a"))
        .agg(sum(col("cab")).as("ca"), count(lit(1)).cast("bigint").as("n1a"))
      val cont = pair.groupBy(col("b")).agg(count(lit(1)).cast("bigint").as("n1b"))
      val vv = pair.agg(count(lit(1)).cast("bigint").as("v"))
      db.join(pair, Seq("a", "b")).join(lft, Seq("a")).join(cont, Seq("b"))
        .crossJoin(broadcast(vv))
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).cast("bigint").as("n_bigrams"),
          sum(col("k") * expr(
            "(1000000 * ((4 * cab - 3) * v + 3 * n1a * n1b)) DIV (4 * ca * v)"))
            .as("sp"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sp DIV n_bigrams").cast("bigint").as("kn_score"))
    },

    // ----------------------------------------------------------------
    q("q136_bpe_encode",
      """BPE tokenizer APPLICATION — the pair of q129's training: apply
        |the 10 learned merges to every document and emit per-doc token
        |counts (pre-merge symbol count, post-merge token count, merges
        |applied). Semantics: merges applied once each, in rank order —
        |exactly the corpus state at the end of training round 10,
        |which is how the trainer itself evolves the corpus (round k
        |applies merge k once, corpus-wide). The kernel is the
        |bracketed-symbol rendering shared with q129's oracle: every
        |non-space char becomes chr(1)c chr(2), and each merge is ONE
        |string replace() of chr(1)a chr(2)chr(1)b chr(2) →
        |chr(1)ab chr(2) — replace() is left-to-right, non-overlapping,
        |resumes after each replacement, and adjacent matches share no
        |characters, so it IS BPE merge application; token count is
        |chr(1)-mark counting by length difference. Scale shape: the
        |merge table is a session-cached training artifact
        |(BpeTrainer.trainCached — train once, encode everywhere, as a
        |production pipeline ships a frozen tokenizer); the encode
        |itself is a pure scan-side projection — 10 chained codegen
        |string replaces, zero shuffle, zero UDF.""".stripMargin,
      bpeEncodeOracleSql(10)) { (s, dir) =>
      val merges = BpeTrainer.trainCached(s, dir, 10)
      val br = bpeBracketCol(col("text"))
      val enc = bpeEncodeCol(merges, col("text"))
      def nMarks(c: org.apache.spark.sql.Column) =
        (length(c) - length(call_function("replace", c, lit(S1), lit("")))).cast("long")
      Tables.documents(s, dir).select(col("doc_id"),
        nMarks(br).as("n_syms"),
        nMarks(enc).as("n_tokens"),
        (nMarks(br) - nMarks(enc)).as("n_merges_applied"))
    },

    // ----------------------------------------------------------------
    q("q137_lang_rebalance",
      """Data-derived corpus rebalancing — q81's stratified gate with
        |the rates computed FROM the data instead of fixed: downsample
        |every language to (approximately) the smallest language's
        |volume, the uniform-mixture construction step of multilingual
        |pretraining. rate_lang = (n_min * 1000) DIV n_lang per-mille,
        |applied through the deterministic affine hash gate (same
        |family as q81/q80, different constants — reproducible across
        |reruns, partitionings and cluster sizes, which seeded rand()
        |is not). Scale shape: the per-lang histogram is one tiny agg;
        |the single-row min and the rated histogram ride back as
        |BROADCASTS, so the gate stays a scan-side predicate on the
        |corpus — no corpus shuffle at any scale. Emits per-lang totals
        |and kept counts.""".stripMargin,
      s"""WITH c AS (SELECT lang, count(*)::BIGINT AS n_total FROM documents GROUP BY 1),
        |m AS (SELECT min(n_total) AS n_min FROM c),
        |r AS (SELECT lang, n_total, (n_min * 1000) // n_total AS rate FROM c, m)
        |SELECT d.lang, r.n_total,
        |  CAST(sum(CASE WHEN ((37 * d.doc_id + 11) % $P) % 1000 < r.rate
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN r ON d.lang = r.lang
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
      val nmin = counts.agg(min(col("n_total")).as("n_min"))
      val rated = counts.crossJoin(broadcast(nmin))
        .select(col("lang"), col("n_total"),
          expr("(n_min * 1000) DIV n_total").as("rate"))
      val gate = ((lit(37L) * col("doc_id") + lit(11L)) % P) % 1000 < col("rate")
      docs.join(broadcast(rated), Seq("lang"))
        .groupBy(col("lang"), col("n_total"))
        .agg(sum(when(gate, 1L).otherwise(0L)).cast("bigint").as("n_kept"))
        .select(col("lang"), col("n_total"), col("n_kept"))
    },

    // ----------------------------------------------------------------
    q("q140_bpe_vocab_freq",
      """Learned-vocabulary frequency profile — the closing audit of the
        |BPE tier (q129 train → q136 encode → THIS): tokenize the whole
        |corpus with the learned merges and emit the top-30 tokens with
        |corpus frequency and document frequency. Proves the encode
        |produces a PARSEABLE token stream (tokens are recovered from
        |the bracketed encoding by regex, not recounted from theory)
        |and is what a tokenizer-acceptance check reads (which merges
        |actually earn their vocab slots). Scale shape: encode is
        |scan-side (q136); token extraction is a row-local regex; the
        |two counts are one hash agg keyed by token (map-side combine
        |over vocab cardinality) with df as an exact distinct on
        |(token, doc) — bounded by corpus token incidence; top-30 via
        |TakeOrdered.""".stripMargin,
      bpeVocabOracleSql(10)) { (s, dir) =>
      val merges = BpeTrainer.trainCached(s, dir, 10)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(call_function("regexp_extract_all",
            bpeEncodeCol(merges, col("text")),
            lit(S1 + "([^" + S2 + "]*)" + S2), lit(1))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(30)
    },

    // ----------------------------------------------------------------
    q("q141_postings_list",
      """Inverted-index construction — the retrieval-side materialization
        |step q125's BM25 scoring assumes exists: for the 50 highest-df
        |terms, the top-3 postings (doc_id, tf) per term plus the term's
        |document frequency and total term frequency. Scale shape: tf is
        |one (term, doc)-keyed agg with map-side combine; per-term stats
        |are a vocab-sized agg DERIVED from tf (the corpus is not
        |re-read); the 50-term head rides back as a BROADCAST so the
        |postings rank runs only over the selected terms' rows; the rank
        |window is PARTITIONED by term (max 50 partitions of df rows —
        |never a partition-less window). Ordering is deterministic
        |everywhere: (df desc, term) for the head, (tf desc, doc_id) for
        |postings.""".stripMargin,
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (
        |  SELECT term, doc_id, count(*)::BIGINT AS tf
        |  FROM t WHERE term <> '' GROUP BY 1, 2),
        |st AS (
        |  SELECT term, count(*)::BIGINT AS df, CAST(sum(tf) AS BIGINT) AS total_tf
        |  FROM tf GROUP BY 1),
        |top AS (SELECT * FROM st ORDER BY df DESC, term LIMIT 50),
        |r AS (
        |  SELECT tf.term, top.df, top.total_tf,
        |    row_number() OVER (PARTITION BY tf.term ORDER BY tf.tf DESC, tf.doc_id) AS rk,
        |    tf.doc_id, tf.tf
        |  FROM tf JOIN top ON tf.term = top.term)
        |SELECT term, df, total_tf, rk, doc_id, tf FROM r WHERE rk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val st = tf.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      val top = st.orderBy(col("df").desc, col("term")).limit(50)
      tf.join(broadcast(top), Seq("term"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))).cast("bigint"))
        .filter(col("rk") <= 3)
        .select(col("term"), col("df"), col("total_tf"), col("rk"),
          col("doc_id"), col("tf"))
    },

    // ----------------------------------------------------------------
    q("q142_context_windows",
      """Context-window construction — the document→training-example
        |shaping step between curation and q99's packing: fixed-size
        |token windows (32 tokens, stride 16, full windows only) with a
        |content hash per window, the unit a pretraining loader actually
        |consumes (the 50% overlap is the standard long-document
        |recipe). Entirely scan-side: tokenize, compute the window
        |count closed-form, explode the window INDEX range (never the
        |token array twice), slice + hash per window — zero shuffle,
        |zero UDF, output rows bounded by corpus tokens / stride. The
        |hash makes windows content-addressable, which is what lets a
        |downstream window-level dedup run without re-reading text.""".stripMargin,
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, w,
        |    CASE WHEN len(w) >= 32 THEN (len(w) - 32) // 16 + 1 ELSE 0 END AS nw
        |  FROM w),
        |e AS (SELECT doc_id, unnest(range(0, nw)) AS k, w FROM x)
        |SELECT doc_id, k AS win_idx, CAST(k * 16 + 1 AS BIGINT) AS start_tok,
        |  md5(array_to_string(w[(k * 16 + 1):(k * 16 + 32)], ' ')) AS win_hash
        |FROM e""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), "\\s+"), x => x =!= "").as("w"))
        .withColumn("nw", expr(
          "CASE WHEN size(w) >= 32 THEN (size(w) - 32) DIV 16 + 1 ELSE 0 END"))
        .select(col("doc_id"), col("w"),
          explode(expr(
            "CASE WHEN nw > 0 THEN sequence(CAST(0 AS BIGINT), nw - 1) ELSE array() END")).as("k"))
        .select(col("doc_id"), col("k").as("win_idx"),
          (col("k") * 16 + 1).as("start_tok"),
          md5(concat_ws(" ",
            slice(col("w"), (col("k") * 16 + 1).cast("int"), lit(32)))).as("win_hash"))
    },

    // ----------------------------------------------------------------
    q("q147_token_apportionment",
      """Mixture construction by EXACT budget apportionment: split a
        |100k-token budget across sources proportionally to their
        |volume using the largest-remainder (Hamilton) method — floor
        |quotas first, then the leftover units go to the largest
        |remainders with a deterministic (remainder desc, source) tie
        |break. The allocations are integers that sum to the budget
        |EXACTLY (asserted by spec) — what a sampling job actually
        |needs, where proportional floats never add up. Window-free on
        |the Spark side: the per-source table collapses to ONE sorted
        |array row (q82's TakeOrdered/array-math discipline — source
        |cardinality is small, but the no-partition-less-window rule
        |holds suite-wide), so ranking is array position; the oracle
        |uses DuckDB's row_number freely as an independent shape.
        |Scale: one source-keyed agg with map-side combine, one scalar
        |total broadcast, arithmetic on a source-cardinality array.""".stripMargin,
      """WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_tok FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM s),
        |b AS (SELECT source, n_tok, (100000 * n_tok) // total AS base,
        |        (100000 * n_tok) % total AS rem FROM s, t),
        |l AS (SELECT 100000 - CAST(sum(base) AS BIGINT) AS leftover FROM b),
        |r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b)
        |SELECT source, n_tok,
        |  CAST(base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r, l""".stripMargin) { (s, dir) =>
      val B = 100000L
      val src = Tables.documents(s, dir)
        .groupBy(col("source")).agg(sum(col("n_chars")).as("n_tok"))
      val tot = src.agg(sum(col("n_tok")).as("total"))
      val based = src.crossJoin(broadcast(tot)).select(
        col("source"), col("n_tok"),
        expr(s"(${B}L * n_tok) DIV total").as("base"),
        expr(s"(${B}L * n_tok) % total").as("rem"))
      // one sorted array row: ascending struct order on (-rem, source)
      // IS (remainder desc, source asc) — rank becomes array position
      val one = based.agg(
        sum(col("base")).as("sumbase"),
        sort_array(collect_list(struct((-col("rem")).as("nr"),
          col("source").as("source"), col("n_tok").as("n_tok"),
          col("base").as("base")))).as("xs"))
      one.select(expr(s"${B}L - sumbase").as("leftover"), posexplode(col("xs")))
        .select(col("col.source").as("source"), col("col.n_tok").as("n_tok"),
          (col("col.base") +
            when(col("pos") < col("leftover"), 1L).otherwise(0L))
            .cast("bigint").as("alloc"))
    },

    // ----------------------------------------------------------------
    q("q155_priority_sampling",
      """Deterministic WEIGHTED sampling by priority (the Duffield/
        |Lund/Thorup priority-sampling scheme): each document draws
        |priority = weight / u for a per-item uniform u, and the top-k
        |priorities are a weighted sample without replacement — heavier
        |documents proportionally likelier, every item still possible.
        |Here u comes from the q153 hash recipe (base-131 fold over the
        |zero-padded key + one modular-squaring avalanche pass), so the
        |sample is a PURE FUNCTION of the data: the same 25 documents
        |on any cluster, any partitioning, any run — the
        |reproducibility/auditability property q81's stratified gate
        |established, extended to continuous weights. The ratio is
        |integer fixed-point ((w * 1e9) DIV (mix(h) + 1)), so ranking
        |is floor-division-exact cross-engine. Scale shape: priorities
        |are scan-side arithmetic; top-25 by (priority, doc_id) runs as
        |TakeOrdered — no global sort, no shuffle of the corpus.""".stripMargin,
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 13),
        |        i -> CAST(ascii(substr(lpad(CAST(doc_id AS VARCHAR), 12, '0'), i, 1)) AS BIGINT))),
        |      (a, c) -> (a * 131 + c) % 1000000007) AS h0
        |  FROM documents)
        |SELECT doc_id, source, n_chars,
        |  (n_chars * CAST(1000000000 AS BIGINT)) // ((h0 * h0 + h0) % 1000000007 + 1) AS priority
        |FROM h
        |ORDER BY priority DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      graft.plans.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          call_function("rolling_hash",
            lpad(col("doc_id").cast("string"), 12, "0")).as("h0"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("(n_chars * CAST(1000000000 AS BIGINT)) DIV ((h0 * h0 + h0) % 1000000007 + 1)")
            .as("priority"))
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(25)
    },

    // ----------------------------------------------------------------
    q("q160_skyline",
      """Pareto-skyline curation (the classic skyline operator, Börzsönyi
        |et al. ICDE 2001): the documents no other document dominates on
        |(length, lexical diversity) — longer AND more diverse beats
        |either alone, so the skyline is the efficient frontier a
        |quality-vs-quantity selection sweeps. Diversity is integer
        |permille (1000·distinct tokens DIV tokens); dominance is the
        |standard ∃-strict form. The naive skyline is an all-pairs
        |anti-join; this runs the 2-D SWEEP reduction instead: per
        |distinct length the max diversity M(x) (value-cardinality-
        |bounded agg), the STRICT prefix max H(x) = max{M(x') : x' > x}
        |via the triangular join on the bounded distinct-length table
        |(DistributedRank's offs discipline — no partition-less window
        |even over tiny inputs), and a doc survives iff y = M(x) and
        |y > H(x) — a per-row test against two broadcast-joined
        |length-keyed columns. Corpus work is one scan + one
        |length-keyed agg; the quadratic piece touches only distinct
        |lengths. The oracle is the DOMINANCE DEFINITION ITSELF
        |(NOT EXISTS all-pairs in DuckDB) — two independent
        |formulations, one frontier.""".stripMargin,
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS BIGINT) AS n_tok,
        |    CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))) AS BIGINT) AS n_dis
        |  FROM documents),
        |s AS (SELECT doc_id, n_tok, (1000 * n_dis) // n_tok AS diversity_pm
        |      FROM d WHERE n_tok > 0)
        |SELECT a.doc_id, a.n_tok, a.diversity_pm
        |FROM s a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM s b
        |  WHERE (b.n_tok > a.n_tok AND b.diversity_pm >= a.diversity_pm)
        |     OR (b.n_tok >= a.n_tok AND b.diversity_pm > a.diversity_pm))""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          filter(split(col("text"), "\\s+"), t => t =!= "").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
          size(array_distinct(col("w"))).cast("long").as("n_dis"))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("n_tok"),
          expr("(1000 * n_dis) DIV n_tok").as("diversity_pm"))
      val m = docs.groupBy(col("n_tok")).agg(max(col("diversity_pm")).as("m"))
      val h = m.as("a")
        .join(m.as("b"), col("b.n_tok") > col("a.n_tok"), "left")
        .groupBy(col("a.n_tok").as("n_tok"))
        .agg(coalesce(max(col("b.m")), lit(-1L)).as("h"))
      docs
        .join(broadcast(m), Seq("n_tok"))
        .join(broadcast(h), Seq("n_tok"))
        .filter(col("diversity_pm") === col("m") && col("diversity_pm") > col("h"))
        .select(col("doc_id"), col("n_tok"), col("diversity_pm"))
    },

    // ----------------------------------------------------------------
    q("q163_hybrid_rrf",
      """Hybrid retrieval by reciprocal-rank fusion (Cormack et al.
        |2009, the standard hybrid-search combiner): q125's exact
        |fixed-point BM25 ranking and an exact integer inner-product
        |ranking against a query embedding (vector 0 — the MIPS mode
        |DPR-style embeddings retrieve with) are fused as
        |Σ 1e6 DIV (60 + rank) over each list's top-50 — rank fusion
        |needs no score calibration, which is exactly why it's the
        |production default. Window-free ranking: each side's top-50
        |comes from TakeOrdered, then collapses to ONE sorted array row
        |(q147's discipline) so rank = array position; absent-from-list
        |contributes 0 (rank reported as 0). The two lists meet in a
        |doc-keyed full outer join of 50-row inputs; every score, rank,
        |and fusion term is integer, so the fused order is bit-identical
        |cross-engine — the oracle re-ranks both lists independently
        |with row_number. Scale shape: both scorings are scan-side with
        |one-row broadcast stats/query; the corpus never shuffles.""".stripMargin,
      """WITH tf AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'join'))   AS tf_join,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'spark'))  AS tf_spark,
        |    len(list_filter(string_split(lower(text), ' '), x -> x = 'window')) AS tf_window
        |  FROM documents),
        |st AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
        |    sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)   AS df_join,
        |    sum(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END)  AS df_spark,
        |    sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window
        |  FROM tf),
        |bm AS (
        |  SELECT doc_id,
        |    CAST(((n * 100) // greatest(df_join, 1))
        |           * ((22 * tf_join * sumdl * 1000000)
        |              // (10 * tf_join * sumdl + 3 * sumdl + 9 * dl * n))
        |       + ((n * 100) // greatest(df_spark, 1))
        |           * ((22 * tf_spark * sumdl * 1000000)
        |              // (10 * tf_spark * sumdl + 3 * sumdl + 9 * dl * n))
        |       + ((n * 100) // greatest(df_window, 1))
        |           * ((22 * tf_window * sumdl * 1000000)
        |              // (10 * tf_window * sumdl + 3 * sumdl + 9 * dl * n))
        |      AS BIGINT) AS score
        |  FROM tf, st),
        |bt AS (SELECT doc_id AS id,
        |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank_text
        |       FROM bm ORDER BY score DESC, doc_id LIMIT 50),
        |e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(9,4))
        |              * 10000 AS BIGINT)) AS vm
        |  FROM embeddings),
        |qv AS (SELECT vm AS qm FROM e WHERE vec_id = 0),
        |ip AS (
        |  SELECT vec_id AS id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(vm) + 1), i -> vm[i] * qm[i])),
        |      (a, b) -> a + b) AS score
        |  FROM e, qv),
        |vt AS (SELECT id,
        |         row_number() OVER (ORDER BY score DESC, id) AS rank_vec
        |       FROM ip ORDER BY score DESC, id LIMIT 50),
        |f AS (
        |  SELECT coalesce(bt.id, vt.id) AS doc_id,
        |    CAST(coalesce(bt.rank_text, 0) AS BIGINT) AS rank_text,
        |    CAST(coalesce(vt.rank_vec, 0) AS BIGINT) AS rank_vec,
        |    CAST(CASE WHEN bt.rank_text IS NOT NULL
        |              THEN 1000000 // (60 + bt.rank_text) ELSE 0 END
        |       + CASE WHEN vt.rank_vec IS NOT NULL
        |              THEN 1000000 // (60 + vt.rank_vec) ELSE 0 END AS BIGINT) AS rrf
        |  FROM bt FULL OUTER JOIN vt ON bt.id = vt.id)
        |SELECT doc_id, rank_text, rank_vec, rrf
        |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      val terms = Seq("join", "spark", "window")
      val tf = Tables.documents(s, dir).select(
        col("doc_id") +:
          size(split(lower(col("text")), " ")).cast("long").as("dl") +:
          terms.map(t => size(expr(
            s"filter(split(lower(text), ' '), x -> x = '$t')")).cast("long")
            .as(s"tf_$t")): _*)
      val statCols: Seq[org.apache.spark.sql.Column] =
        count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
          terms.map(t =>
            sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
      val st = tf.agg(statCols.head, statCols.tail: _*)
      val bm = tf.crossJoin(broadcast(st))
        .select(col("doc_id"),
          terms.map(t => expr(
            s"""((n * 100) DIV greatest(df_$t, 1))
               |* ((22 * tf_$t * sumdl * 1000000)
               |   DIV (10 * tf_$t * sumdl + 3 * sumdl + 9 * dl * n))""".stripMargin))
            .reduce(_ + _).cast("long").as("score"))
      def ranks(top: org.apache.spark.sql.DataFrame, rankName: String) =
        top.agg(sort_array(collect_list(struct(
            (-col("score")).as("ns"), col("id").as("id")))).as("xs"))
          .select(posexplode(col("xs")))
          .select(col("col.id").as("id"), (col("pos") + 1).cast("long").as(rankName))
      val bmRank = ranks(
        bm.orderBy(col("score").desc, col("doc_id")).limit(50)
          .select(col("doc_id").as("id"), col("score")), "rank_text")
      val e = Tables.embeddings(s, dir)
        .withColumn("vm", expr(
          """transform(embedding,
            |  x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(9,4))
            |            * 10000 AS BIGINT))""".stripMargin))
      val qv = e.filter(col("vec_id") === 0).select(col("vm").as("qm"))
      val ip = e.crossJoin(broadcast(qv))
        .select(col("vec_id").as("id"), expr(
          """aggregate(zip_with(vm, qm, (a, b) -> a * b),
            |          CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("score"))
      val ipRank = ranks(
        ip.orderBy(col("score").desc, col("id")).limit(50), "rank_vec")
      // full outer has no BroadcastHashJoin form (hint verified ignored),
      // but both rank lists are limit(50)-bounded, so the SMJ here sorts
      // ≤ 100 rows — scale-safe as is
      bmRank.join(ipRank, Seq("id"), "full_outer")
        .select(col("id").as("doc_id"),
          coalesce(col("rank_text"), lit(0L)).as("rank_text"),
          coalesce(col("rank_vec"), lit(0L)).as("rank_vec"),
          (when(col("rank_text").isNotNull,
              expr("1000000 DIV (60 + rank_text)")).otherwise(0L) +
            when(col("rank_vec").isNotNull,
              expr("1000000 DIV (60 + rank_vec)")).otherwise(0L))
            .cast("long").as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(20)
    },

    // ----------------------------------------------------------------
    q("q169_lang_mix_divergence",
      """Per-source LANGUAGE-MIX drift — the data-mixing health check
        |behind q137's rebalance: a chi-square statistic comparing each
        |source's language distribution against the corpus-wide one,
        |computed over the FULL contingency grid (absent (source, lang)
        |cells contribute their expected count — omitting them is the
        |classic chi-square bug) and carried exactly in parts per
        |million: each cell's (o·T − r·c)² / (r·c·T) runs through
        |DECIMAL(38)/HUGEINT products and one integer floor division —
        |no floats, no log, both engines bit-identical (the q156
        |discipline).  Scale shape: three small aggregates (cell,
        |row-total, column-total) each one hash shuffle with map-side
        |combine; the grid is |sources|×|langs| — built by crossing the
        |two broadcast-sized total tables, never by expanding data
        |rows; the verdict collapses right back to |sources|.""".stripMargin,
      """WITH obs AS (SELECT source, lang, count(*)::BIGINT AS o
        |             FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, count(*)::BIGINT AS r FROM documents GROUP BY 1),
        |c AS (SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS t FROM documents),
        |g AS (
        |  SELECT r.source, c.lang, r.r, c.c, t.t,
        |    CAST(coalesce(obs.o, 0) AS BIGINT) AS o
        |  FROM r CROSS JOIN c CROSS JOIN t
        |  LEFT JOIN obs ON obs.source = r.source AND obs.lang = c.lang),
        |terms AS (
        |  SELECT source, r,
        |    CAST((1000000 * CAST(o*t - r*c AS HUGEINT) * CAST(o*t - r*c AS HUGEINT))
        |         // (CAST(r AS HUGEINT) * c * t) AS BIGINT) AS term
        |  FROM g)
        |SELECT source, r AS n_docs,
        |  CAST(sum(term) AS BIGINT) AS chi2_ppm,
        |  max(term) AS max_cell_ppm
        |FROM terms GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      // one corpus scan: the cell counts are sufficient statistics —
      // row/column/grand totals are aggregates OF the (tiny) cell table,
      // not separate passes over documents
      val obs = Tables.documents(s, dir)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      val r = obs.groupBy(col("source")).agg(sum(col("o")).cast("long").as("r"))
      val c = obs.groupBy(col("lang")).agg(sum(col("o")).cast("long").as("c"))
      val t = obs.agg(sum(col("o")).cast("long").as("t"))
      r.crossJoin(broadcast(c)).crossJoin(broadcast(t))
        .join(obs, Seq("source", "lang"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .select(col("source"), col("r"),
          expr("""CAST((1000000 * CAST(o*t - r*c AS DECIMAL(38,0)) * CAST(o*t - r*c AS DECIMAL(38,0)))
                 |     DIV (CAST(r AS DECIMAL(38,0)) * c * t) AS BIGINT)""".stripMargin)
            .as("term"))
        .groupBy(col("source"), col("r").as("n_docs"))
        .agg(sum(col("term")).cast("long").as("chi2_ppm"),
          max(col("term")).as("max_cell_ppm"))
        .select(col("source"), col("n_docs"), col("chi2_ppm"), col("max_cell_ppm"))
    },

    // ----------------------------------------------------------------
    q("q176_mmr_selection",
      """Maximal-marginal-relevance (MMR) DIVERSIFIED selection — the
        |curation step after retrieval: from the 12 most query-relevant
        |vectors, greedily pick 5 that balance relevance against
        |redundancy, scoring each remaining candidate rel − max sim to
        |the already-selected set (the λ=½ MMR objective, common scale
        |factor cancelled).  The 5 greedy rounds unroll as an array
        |PROGRAM over the pool collapsed to one row: each round is a
        |transform/array_sort/filter step ((mmr desc, vec_id) argmax
        |via a comparator lambda), executor-side, NO driver collect.
        |All similarity is the q163 fixed-point inner product
        |(round-to-4-decimals × 10000, exact int64 sums), so both
        |engines pick identical sets.  Scale shape: one corpus pass
        |computes query relevance (broadcast query vector, scan-side
        |dot); everything after the top-12 TakeOrdered is
        |candidate-bounded (≤ 12-element arrays in a single row) — the
        |greedy recursion never touches the corpus again, and costs
        |one stage instead of the previous shape's ~15 tiny per-round
        |join stages.""".stripMargin,
      {
        val dot = (a: String, b: String) =>
          s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
             |  list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])),
             |  (x, y) -> x + y)""".stripMargin
        val rounds = (2 to 5).map { r =>
          s"""r$r AS (
             |  SELECT c.vec_id, CAST($r AS BIGINT) AS pick_order, c.rel,
             |    c.rel - max(p.sim) AS mmr
             |  FROM cand c
             |  JOIN pairs p ON p.ca = c.vec_id
             |    AND p.cb IN (SELECT vec_id FROM sel${r - 1})
             |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
             |  GROUP BY c.vec_id, c.rel
             |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
             |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM r$r)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (
           |  SELECT vec_id, list_transform(embedding,
           |    x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(9,4))
           |              * 10000 AS BIGINT)) AS vm
           |  FROM embeddings),
           |qv AS (SELECT vm AS qm FROM e WHERE vec_id = 0),
           |rel AS (
           |  SELECT vec_id, vm, ${dot("vm", "qm")} AS rel
           |  FROM e, qv WHERE vec_id <> 0),
           |cand AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 12),
           |pairs AS (
           |  SELECT a.vec_id AS ca, b.vec_id AS cb, ${dot("a.vm", "b.vm")} AS sim
           |  FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
           |sel1 AS (
           |  SELECT vec_id, CAST(1 AS BIGINT) AS pick_order, rel, rel AS mmr
           |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
           |$rounds
           |SELECT pick_order, vec_id, rel AS rel_score, mmr AS mmr_score
           |FROM sel5""".stripMargin
      }) { (s, dir) =>
      val dotExpr = expr(
        """aggregate(zip_with(va, vb, (a, b) -> a * b),
          |          CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
      val e = Tables.embeddings(s, dir).withColumn("vm", expr(
        """transform(embedding,
          |  x -> CAST(CAST(round(CAST(x AS DOUBLE), 4) AS DECIMAL(9,4))
          |            * 10000 AS BIGINT))""".stripMargin))
      val qv = e.filter(col("vec_id") === 0).select(col("vm").as("vb"))
      val rel = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"), col("vm"), col("vm").as("va"), col("vb"))
        .withColumn("rel", dotExpr)
        .select(col("vec_id"), col("vm"), col("rel"))
      // The 12-candidate pool collapses to ONE array row, and the whole
      // greedy recursion runs as a single `aggregate` FOLD over
      // sequence(2, 5) with state (sel, selv, rem) — executor-side
      // array programs, not per-round joins. The previous shape (cached
      // pool + per-round anti-join/argmax/union plan branches) was
      // correct but latency-bound: ~15 tiny stages for 12 rows. A naive
      // withColumn unroll is no better: CollapseProject inlines every
      // reference to a round's pick, exploding the expression tree
      // ~4x per round (measured: a 426 KB plan that EVALUATED the
      // duplicated subtrees — 6 s vs the loop's 2.4 s). The fold binds
      // each round's pick exactly once — lambda variables evaluate
      // once per binding, so the single-element transform() is a let
      // expression. `get()` not `[..]` so a short pool (< 5 candidates,
      // empty tables) yields null picks that the final isNotNull filter
      // drops — same rows as the old loop's empty-round unions.
      mmrSelect(rel, poolSize = 12, picks = 5)
    },

    // ----------------------------------------------------------------
    q("q193_token_rate_by_source",
      """Tokenizer COST MODEL per source — what a data-pricing /
        |compute-budget pass reads: tokens per 1000 non-space chars
        |under the trained q129 tokenizer, per provenance.  Rides the
        |frozen-tokenizer discipline end to end: merges come from the
        |session-cached trainer (train once, encode everywhere), the
        |encode is q136's 10 chained codegen replaces (scan-side, zero
        |shuffle), and the roll-up is one |sources|-group aggregate of
        |two integer counts with the rate as a floor division — a
        |source whose text compresses poorly under the learned merges
        |(different language, different domain) surfaces immediately
        |as a higher rate.  The oracle re-learns the merges in SQL and
        |re-encodes (the q136/q140 CTE scaffolding), so the ENTIRE
        |train→encode→rate chain is cross-engine pinned.""".stripMargin,
      bpeTokenRateOracleSql(10)) { (s, dir) =>
      val merges = BpeTrainer.trainCached(s, dir, 10)
      val enc = bpeEncodeCol(merges, col("text"))
      def nMarks(c: org.apache.spark.sql.Column) =
        (length(c) - length(call_function("replace", c, lit(S1), lit("")))).cast("long")
      Tables.documents(s, dir)
        .select(col("source"),
          length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_chars"),
          nMarks(enc).as("n_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          col("total_tokens"),
          expr("(1000 * total_tokens) DIV total_chars").as("tokens_per_kilochar"))
    },

    // ----------------------------------------------------------------
    q("q203_importance_resampling",
      """DSIR-style data selection (Xie et al., NeurIPS 2023 "Data
        |Selection for Language Models via Importance Resampling"):
        |score every document by how much its bigram distribution looks
        |like a TARGET domain (here sources src1/src2, the curated-
        |subset stand-in) relative to the raw corpus, and keep the 50
        |highest-scoring docs. Per-bigram importance = add-one-smoothed
        |target/raw frequency ratio; the paper's log-likelihood SUM is
        |deliberately replaced by the count-weighted MEAN ratio (the
        |q135 move: arithmetic mean instead of geometric ranks the same
        |direction without transcendentals), so every score is integer
        |fixed-point (ratio permillion, corpus-prior norm permille)
        |that both engines compute bit-identically. target SUBSET-OF
        |raw bounds the ratio at 1e6, which caps every width: k*rho <=
        |1e10 per doc at sf1 and (total+V)*1000 stays under 2^63 out to
        |~1e16 corpus bigrams. Scale shape: per-doc bigram counts come
        |from the session-cached shared docBigrams frame (built
        |scan-side, zip_with, no join; one corpus tokenize for the
        |whole n-gram tier — they feed the model build AND the scoring
        |join, the q135 discipline); raw and target counts come out of
        |ONE vocab-sized hash agg (a conditional sum, not a second
        |corpus pass); the corpus-level totals are a 1-row broadcast;
        |selection is TakeOrdered(50). No window, no driver data.""".stripMargin,
      """WITH w AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w FROM documents),
        |i AS (SELECT doc_id, (source IN ('src1', 'src2')) AS tgt,
        |        unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM w),
        |db AS (SELECT doc_id, tgt, a, b, count(*)::BIGINT AS k FROM i GROUP BY 1, 2, 3, 4),
        |pair AS (SELECT a, b, CAST(sum(k) AS BIGINT) AS cab,
        |           CAST(sum(CASE WHEN tgt THEN k ELSE 0 END) AS BIGINT) AS cat
        |         FROM db GROUP BY 1, 2),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS v,
        |         CAST(sum(cab) AS BIGINT) AS total_r,
        |         CAST(sum(cat) AS BIGINT) AS total_t FROM pair),
        |sc AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
        |         CAST(sum(k * (((cat + 1) * 1000000) // (cab + 1))) AS BIGINT) AS sp
        |       FROM db JOIN pair USING (a, b) GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |  CAST(((sp // n_bigrams) * (((total_r + v) * 1000) // greatest(total_t + v, 1))) // 1000
        |    AS BIGINT) AS dsir_score
        |FROM sc, st
        |ORDER BY dsir_score DESC, doc_id
        |LIMIT 50""".stripMargin) { (s, dir) =>
      val db = docBigrams(s, dir)
        .select(col("doc_id"), col("tgt"), col("a"), col("b"), col("k"))
      val pair = db.groupBy(col("a"), col("b"))
        .agg(sum(col("k")).cast("long").as("cab"),
          sum(when(col("tgt"), col("k")).otherwise(0L)).cast("long").as("cat"))
      val st = pair.agg(count(lit(1)).as("v"),
        sum(col("cab")).cast("long").as("total_r"),
        sum(col("cat")).cast("long").as("total_t"))
      db.join(pair, Seq("a", "b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("k")).cast("long").as("n_bigrams"),
          sum(col("k") * expr("((cat + 1) * 1000000) DIV (cab + 1)"))
            .cast("long").as("sp"))
        .crossJoin(broadcast(st))
        // greatest(...,1): only reachable on an empty corpus, where the
        // per-doc agg yields zero groups anyway — but DIV must stay
        // total under ANSI for EmptyInputSpec
        .select(col("doc_id"), col("n_bigrams"), expr(
          """((sp DIV n_bigrams)
            | * (((total_r + v) * 1000) DIV greatest(total_t + v, 1))) DIV 1000""".stripMargin)
          .cast("long").as("dsir_score"))
        .orderBy(col("dsir_score").desc, col("doc_id")).limit(50)
    },

    // ----------------------------------------------------------------
    q("q204_perplexity_buckets",
      """CCNet-style quality bucketing (Wenzek et al., LREC 2020): the
        |head/middle/tail split that follows model-based scoring in the
        |published pipeline. Every doc gets q135's corpus-bigram LM
        |score (same integer fixed-point formula), then each LANGUAGE
        |is cut at its score terciles — head = best-scoring third.
        |Boundaries are VALUE-based (the score of the ceil(n/3)-th doc;
        |ties at a boundary all land in the better bucket), so the
        |assignment is deterministic with no per-doc ranking. Scale
        |shape: the tercile boundaries come from HISTOGRAM INVERSION
        |(the q202 percentile trick) — a lang x score count agg whose
        |size is bounded by |langs| x 1e6 distinct fixed-point scores,
        |then a lang-partitioned running sum over those DISTINCT-score
        |rows (window state bounded by the score space, NOT by |docs|;
        |ranking all docs per lang would instead sort the whole corpus
        |through |langs| partitions). The |langs|-row threshold table
        |broadcasts back and bucketing is scan-side CASE arithmetic.
        |Output: per (lang, bucket) doc counts and score ranges.""".stripMargin,
      """WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents),
        |i AS (SELECT doc_id, lang, unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b FROM w),
        |db AS (SELECT doc_id, lang, a, b, count(*)::BIGINT AS k FROM i GROUP BY 1, 2, 3, 4),
        |pair AS (SELECT a, b, CAST(sum(k) AS BIGINT) AS cab FROM db GROUP BY 1, 2),
        |lft AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM pair GROUP BY 1),
        |sc AS (SELECT doc_id, lang,
        |         CAST(CAST(sum(k * ((cab * 1000000) // ca)) AS BIGINT)
        |              // CAST(sum(k) AS BIGINT) AS BIGINT) AS lm_score
        |       FROM db JOIN pair USING (a, b) JOIN lft USING (a) GROUP BY 1, 2),
        |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM sc GROUP BY 1),
        |dist AS (SELECT lang, lm_score, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY 1, 2),
        |cum AS (SELECT lang, lm_score,
        |          CAST(sum(c) OVER (PARTITION BY lang ORDER BY lm_score DESC) AS BIGINT) AS cum
        |        FROM dist),
        |thr AS (SELECT c.lang,
        |          max(CASE WHEN c.cum >= (n.n + 2) // 3 THEN c.lm_score END) AS b1,
        |          max(CASE WHEN c.cum >= (2 * n.n + 2) // 3 THEN c.lm_score END) AS b2
        |        FROM cum c JOIN n ON c.lang = n.lang GROUP BY 1)
        |SELECT s.lang,
        |  CASE WHEN s.lm_score >= t.b1 THEN 'head'
        |       WHEN s.lm_score >= t.b2 THEN 'middle' ELSE 'tail' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(s.lm_score) AS min_score, max(s.lm_score) AS max_score
        |FROM sc s JOIN thr t ON s.lang = t.lang
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val sc = lmScores(s, dir)
      val thr = tercileThresholds(sc)
      sc.join(broadcast(thr), Seq("lang"))
        .select(col("lang"), bucketExpr.as("bucket"), col("lm_score"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("lm_score")).as("min_score"),
          max(col("lm_score")).as("max_score"))
    },

    // ----------------------------------------------------------------
    q("q207_unimax_allocation",
      """UniMax language-budget allocation (Chung et al., ICLR 2023):
        |given a token budget and a per-language epoch cap, the
        |published greedy — visit languages smallest-first, give each
        |min(cap, remaining/remaining_langs) — which is exactly
        |WATERFILLING, so it has a closed form: language l saturates
        |iff cap_l*(n - rank_l) + prefix_cap <= budget (an all-integer
        |cross-multiplied test, no division), and every unsaturated
        |language gets the common waterline t = (budget - saturated
        |capacity) / #unsaturated, emitted in exact milli-docs via
        |BIGINT division. Budget = 2 epochs of the whole corpus,
        |cap = 3 epochs per language, so the smallest languages
        |saturate and the rest share the waterline (vs q137, which is
        |the UNIFORM mixture — downsample-to-min). Scale shape: ONE
        ||langs|-row count agg is the only corpus pass; ranks come
        |from a broadcast self-join over that tiny table (window-free
        |— |langs|^2 pairs is bounded by the language-code space, not
        |the corpus), and the 1-row saturation totals broadcast back.""".stripMargin,
      """WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
        |             CAST(count(*) AS BIGINT) AS n_langs FROM c),
        |b AS (SELECT c.lang, c.n_docs, 3 * c.n_docs AS cap,
        |             2 * t.total AS budget, t.n_langs FROM c, t),
        |r AS (SELECT lang, n_docs, cap, budget, n_langs,
        |        CAST(count(*) OVER (ORDER BY cap, lang
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_smaller,
        |        CAST(coalesce(sum(cap) OVER (ORDER BY cap, lang
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p_smaller
        |      FROM b),
        |s AS (SELECT *, CASE WHEN cap * (n_langs - n_smaller) + p_smaller <= budget
        |                     THEN 1 ELSE 0 END AS sat FROM r),
        |a AS (SELECT CAST(sum(sat) AS BIGINT) AS n_sat,
        |             CAST(coalesce(sum(CASE WHEN sat = 1 THEN cap END), 0) AS BIGINT) AS p_sat
        |      FROM s)
        |SELECT s.lang, s.n_docs, s.cap AS cap_docs, CAST(s.sat AS BIGINT) AS saturated,
        |  CASE WHEN s.sat = 1 THEN 1000 * s.cap
        |       ELSE (1000 * (s.budget - a.p_sat)) // (s.n_langs - a.n_sat)
        |  END AS alloc_millidocs,
        |  (CASE WHEN s.sat = 1 THEN 1000 * s.cap
        |        ELSE (1000 * (s.budget - a.p_sat)) // (s.n_langs - a.n_sat)
        |   END) // s.n_docs AS epochs_milli
        |FROM s, a""".stripMargin) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .groupBy(col("lang")).agg(count(lit(1)).cast("bigint").as("n_docs"))
      val t = c.agg(sum(col("n_docs")).cast("bigint").as("total"),
        count(lit(1)).cast("bigint").as("n_langs"))
      val b = c.crossJoin(broadcast(t))
        .select(col("lang"), col("n_docs"), (col("n_docs") * 3).as("cap"),
          (col("total") * 2).as("budget"), col("n_langs"))
      val lower = b.select(col("lang").as("l2"), col("cap").as("cap2"))
      val r = b.join(broadcast(lower),
          col("cap2") < col("cap") ||
            (col("cap2") === col("cap") && col("l2") < col("lang")), "left")
        .groupBy(col("lang"), col("n_docs"), col("cap"), col("budget"), col("n_langs"))
        .agg(count(col("l2")).cast("bigint").as("n_smaller"),
          coalesce(sum(col("cap2")), lit(0L)).cast("bigint").as("p_smaller"))
      val sDf = r.withColumn("sat",
        when(col("cap") * (col("n_langs") - col("n_smaller")) + col("p_smaller")
          <= col("budget"), 1L).otherwise(0L))
      val a = sDf.agg(sum(col("sat")).cast("bigint").as("n_sat"),
        coalesce(sum(when(col("sat") === 1, col("cap"))), lit(0L))
          .cast("bigint").as("p_sat"))
      val alloc = when(col("sat") === 1, col("cap") * 1000)
        .otherwise(expr("(1000 * (budget - p_sat)) DIV (n_langs - n_sat)"))
      sDf.crossJoin(broadcast(a))
        .select(col("lang"), col("n_docs"), col("cap").as("cap_docs"),
          col("sat").cast("bigint").as("saturated"),
          alloc.as("alloc_millidocs"),
          (alloc cast "bigint").as("alloc_tmp"))
        .select(col("lang"), col("n_docs"), col("cap_docs"), col("saturated"),
          col("alloc_millidocs"),
          expr("alloc_tmp DIV n_docs").as("epochs_milli"))
    },

    // ----------------------------------------------------------------
    q("q210_tokenizer_fertility",
      """Tokenizer fertility by language — the published tokenizer-
        |EQUITY audit (Petrov et al. 2023, "Language Model Tokenizers
        |Introduce Unfairness Between Languages"; fertility = subword
        |tokens per word is the metric SentencePiece/XLM-R evaluations
        |report): encode the corpus with q129's learned BPE merges
        |(the session-cached frozen tokenizer, same artifact q136/q193
        |apply) and roll up per LANGUAGE — the dimension the q207/q137
        |mixture tier allocates by, closing the loop: a language whose
        |fertility is high pays more tokens per word of budget.
        |Complements q193, which profiles tokens-per-kilochar by
        |SOURCE (feed health); fertility is per-WORD by LANGUAGE
        |(linguistic equity). Integer outputs only (milli-ratios by
        |BIGINT floor division). Scale shape: identical to q136/q193 —
        |the merge table is a cached training artifact, the encode is
        |10 chained codegen string replaces scan-side, and the roll-up
        |is a |langs|-row agg; zero corpus shuffle.""".stripMargin,
      bpeFertilityOracleSql(10)) { (s, dir) =>
      val merges = BpeTrainer.trainCached(s, dir, 10)
      val enc = bpeEncodeCol(merges, col("text"))
      def nMarks(c: org.apache.spark.sql.Column) =
        (length(c) - length(call_function("replace", c, lit(S1), lit("")))).cast("long")
      Tables.documents(s, dir)
        .select(col("lang"),
          size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("bigint")
            .as("n_words"),
          length(regexp_replace(col("text"), "\\s", "")).cast("long").as("n_chars"),
          nMarks(enc).as("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).cast("long").as("total_words"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          sum(col("n_chars")).cast("long").as("total_chars"))
        .select(col("lang"), col("n_docs"), col("total_words"), col("total_tokens"),
          expr("(1000 * total_tokens) DIV total_words").as("fertility_milli"),
          expr("(1000 * total_chars) DIV total_tokens").as("chars_per_token_milli"))
    },

    // ----------------------------------------------------------------
    q("q211_temperature_mixture",
      """Temperature-scaled language sampling (Lample & Conneau 2019,
        |XLM; the alpha=0.5 multinomial every multilingual pretraining
        |recipe since has reused): sample language l proportional to
        |p_l^alpha — at alpha=1/2, w_l = sqrt(n_l)/sum sqrt(n_j),
        |flattening the head without the hard caps of q207 or the
        |full leveling of q137 (the three published mixture
        |strategies, now side by side in the catalog). Exactness:
        |sqrt is IEEE-correctly-rounded in BOTH engines, so
        |floor(sqrt(n*10^6)) is a deterministic integer milli-sqrt
        |and every downstream ratio is BIGINT floor division — no
        |float ever crosses an aggregate. Scale shape: one
        ||langs|-row count agg is the only corpus pass; the 1-row
        |sqrt-sum total broadcasts back; scan-free arithmetic after
        |that.""".stripMargin,
      """WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
        |s AS (SELECT lang, n_docs,
        |        CAST(floor(sqrt(CAST(n_docs * 1000000 AS DOUBLE))) AS BIGINT) AS sqrt_milli
        |      FROM c),
        |t AS (SELECT CAST(sum(sqrt_milli) AS BIGINT) AS ssum,
        |             CAST(sum(n_docs) AS BIGINT) AS total FROM s)
        |SELECT s.lang, s.n_docs, s.sqrt_milli,
        |  (1000 * s.sqrt_milli) // t.ssum AS weight_permille,
        |  (1000 * t.total * s.sqrt_milli) // t.ssum AS alloc_millidocs
        |FROM s, t""".stripMargin) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .groupBy(col("lang")).agg(count(lit(1)).cast("bigint").as("n_docs"))
        .withColumn("sqrt_milli",
          floor(sqrt((col("n_docs") * 1000000L).cast("double"))).cast("bigint"))
      val t = c.agg(sum(col("sqrt_milli")).cast("bigint").as("ssum"),
        sum(col("n_docs")).cast("bigint").as("total"))
      c.crossJoin(broadcast(t))
        .select(col("lang"), col("n_docs"), col("sqrt_milli"),
          expr("(1000 * sqrt_milli) DIV ssum").as("weight_permille"),
          expr("(1000 * total * sqrt_milli) DIV ssum").as("alloc_millidocs"))
    },

    // ----------------------------------------------------------------
    q("q217_shard_manifest",
      """Training-data export: deterministic shard assignment + per-
        |shard manifest — the pipeline-final step every WebDataset/
        |TFRecord-style exporter runs (Aizman et al. 2019; T5's sharded
        |TFRecord exports, Raffel et al. 2020): each document lands in
        |shard (affine-hash(doc_id) mod 16) with a hash-derived
        |within-shard order key, and the manifest records per shard the
        |doc/byte/token tallies, an ORDER-INVARIANT content checksum
        |(sum of each doc's first-32-md5-bits — a re-export with the
        |same inputs must reproduce it bit-for-bit), and the first/last
        |docs in shard order (min_by/max_by on the order key — no sort,
        |no window). The q81 affine gate family makes assignment
        |reproducible on any cluster size or retry — hash partitioning
        |by Spark's own hashpartitioning would pin the layout to
        |Spark's Murmur3 internals, which a manifest consumed by
        |non-JVM trainers cannot replay. Scale shape: assignment,
        |tokenization and checksum are scan-side row-local projections;
        |the manifest is one 16-row agg with map-side combine — the
        |export itself would write DataFrameWriter.partitionBy(shard)
        |with this exact column.""".stripMargin,
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    (31 * doc_id + 7) % $P AS ok,
         |    ((31 * doc_id + 7) % $P) % 16 AS shard,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
         |      AS n_toks,
         |    ${chk32Sql("text")} AS chk32
         |  FROM documents)
         |SELECT shard, count(*)::BIGINT AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_bytes,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(chk32) AS BIGINT) AS content_checksum,
         |  arg_min(doc_id, ok) AS first_doc,
         |  arg_max(doc_id, ok) AS last_doc
         |FROM d GROUP BY 1""".stripMargin) { (s, dir) =>
      shardColumns(Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("n_chars")))
        .groupBy(col("shard"))
        .agg(shardManifestAggs.head, shardManifestAggs.tail: _*)
    },

    // ----------------------------------------------------------------
    q("q224_phrase_search",
      """EXACT PHRASE SEARCH through a positional inverted index — the
        |retrieval capability q141's (term, doc, tf) postings cannot
        |answer (tf loses adjacency; Manning, Raghavan & Schütze 2008
        |§2.4's positional-index phrase algorithm): for the corpus's 5
        |most frequent word 3-grams, resolve every occurrence by
        |intersecting the THREE terms' positional postings on
        |(doc, pos), (doc, pos+1), (doc, pos+2), and report per phrase
        |the occurrence count, distinct-doc count and first containing
        |doc. The oracle computes the same numbers by the DIRECT
        |sliding-window scan, so the hash match proves the index route
        |finds exactly the scan's occurrences — the same
        |different-algorithm discipline as q130's orientation proof.
        |Scale shape: the phrase head is the q221 census (one
        |shingle-keyed agg + TakeOrdered(5), rides back as a broadcast);
        |the postings frame is PRE-FILTERED to the ≤15 query terms by a
        |broadcast semi-join BEFORE any shuffle — the local-mode analog
        |of an index-organized store fetching only the query terms'
        |posting lists, which is the entire point of an inverted index
        |at 100 TB — then repartitioned ONCE by doc so both positional
        |self-joins are co-partitioned; match state never exceeds the
        |query terms' postings.""".stripMargin,
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |sg AS (
        |  SELECT doc_id, array_to_string(w[i:i+2], ' ') AS sh
        |  FROM w, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
        |tc AS (SELECT sh, count(*)::BIGINT AS cnt FROM sg GROUP BY 1),
        |top AS (
        |  SELECT sh, cnt, row_number() OVER (ORDER BY cnt DESC, sh) AS rk
        |  FROM tc ORDER BY cnt DESC, sh LIMIT 5)
        |SELECT CAST(t.rk AS BIGINT) AS rk, t.sh AS phrase, t.cnt AS n_occ,
        |  count(DISTINCT sg.doc_id)::BIGINT AS n_docs,
        |  min(sg.doc_id) AS first_doc
        |FROM top t JOIN sg ON sg.sh = t.sh
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
      // phrase head: q221's census shape — shingle counts, top 5
      val top = docs
        .withColumn("i", explode(when(size(col("w")) >= 3,
          sequence(lit(1), size(col("w")) - 2)).otherwise(array())))
        .select(concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("sh"))
        .groupBy(col("sh")).agg(count(lit(1)).cast("bigint").as("cnt"))
        .orderBy(col("cnt").desc, col("sh")).limit(5)
        .select(struct((-col("cnt")).as("nc"), col("sh")).as("x"))
        .agg(sort_array(collect_list(col("x"))).as("xs"))
        .select(posexplode(col("xs")))
        .select((col("pos") + 1).cast("bigint").as("rk"),
          col("col.sh").as("phrase"), (-col("col.nc")).as("cnt"),
          split(col("col.sh"), " ").as("pw"))
        .transform(graft.Graft.stagedCheckpoint)
      // positional postings, PRE-FILTERED to the query terms (broadcast
      // semi-join — the pruned posting-list fetch), then co-partitioned
      // by doc for both adjacency joins
      val vocab = top.select(explode(col("pw")).as("term")).distinct()
      val posts = docs.select(col("doc_id"), posexplode(col("w")))
        .select(col("doc_id"), col("pos"), col("col").as("term"))
        .join(broadcast(vocab), Seq("term"), "left_semi")
        .repartition(col("doc_id"))
      val ph = top.select(col("rk"), col("phrase"),
        col("pw")(0).as("w1"), col("pw")(1).as("w2"), col("pw")(2).as("w3"))
      val m1 = posts.join(broadcast(ph), col("term") === col("w1"))
        .select(col("rk"), col("phrase"), col("w2"), col("w3"),
          col("doc_id"), col("pos"))
      // n_occ is COUNTED from the index route (never copied from the
      // census) — the oracle's n_occ is the census count, so the hash
      // match is the index ≡ scan occurrence proof
      val hits = m1
        .join(posts.select(col("doc_id"), (col("pos") - 1).as("pos"),
            col("term").as("t2")),
          Seq("doc_id", "pos"))
        .filter(col("t2") === col("w2"))
        .join(posts.select(col("doc_id"), (col("pos") - 2).as("pos"),
            col("term").as("t3")),
          Seq("doc_id", "pos"))
        .filter(col("t3") === col("w3"))
      hits.groupBy(col("rk"), col("phrase"))
        .agg(count(lit(1)).cast("bigint").as("n_occ"),
          countDistinct(col("doc_id")).cast("bigint").as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .select(col("rk"), col("phrase"), col("n_occ"), col("n_docs"),
          col("first_doc"))
    },

    // ----------------------------------------------------------------
    q("q246_quality_classifier",
      """Trained quality classifier — the DISCRIMINATIVE half of data
        |selection (GPT-3, Brown et al. 2020 §A.2's curated-vs-crawl
        |logistic gate; LLaMA, Touvron et al. 2023 §2's classifier
        |filters) that q203's DSIR importance-sampling complements: a
        |batch perceptron (Rosenblatt 1958; batch form per Duda & Hart
        |1973 §5.5) over 256 hashed bag-of-words presence features plus
        |bias, trained ref-vs-corpus with the q203 target convention
        |(src1/src2 = the curated stand-in, label +1; everything else
        |-1). Three full-batch passes: each scores every doc with the
        |current weights, takes the misclassified set (y·s <= 0), and
        |adds the signed feature sums — ALL-INTEGER, division-free, and
        |order-independent within a pass, so both engines derive
        |IDENTICAL weights (the oracle unrolls the same three passes as
        |CTEs). Output is the selection census the gate would publish:
        |per source, how many docs the classifier keeps (margin > 0)
        |and the summed margin. Scale shape (q129's k-pass discipline):
        |the corpus is scanned once into a staged compact feature frame
        |(<= tokens-per-doc rows of 4 small cols); each pass is ONE job
        |over that frame — scoring via a 257-long broadcast weight
        |literal, error census via a doc-keyed semi-join, gradient as a
        |257-row hash agg collected to the driver (bounded: the model,
        |never the data); final scoring is scan-side. No window, no
        |pair space, nothing corpus-sized on the driver.""".stripMargin,
      s"""WITH $perceptronOracleCtes
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN sf.s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
         |  CAST(sum(sf.s) AS BIGINT) AS margin_sum
         |FROM documents d JOIN sf USING (doc_id)
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      perceptronCensusOf(trainedScores(s, dir))
    },

    // ----------------------------------------------------------------
    q("q258_padding_census",
      """Length-bucketed batching waste census — the dynamic-batching
        |planner's input (tensor2tensor/fairseq bucket-by-length): docs
        |are bucketed to the next power-of-two token length, and per
        |bucket the census reports doc count, real tokens, pad tokens
        |to the bucket boundary, waste permille, and what a FIXED
        |512-token window would cost instead (pad + truncation loss) —
        |the two numbers that justify bucketed batching over pad-to-max.
        |The bucket cap is pure integer bit arithmetic (2^bitlen(l-1),
        |the q247 floor-log2 = length(bin) - 1 idiom), identical in both
        |engines — no float log anywhere. Scale shape: the cap is a
        |row-local expression, the census a ~log(max_len)-group agg with
        |map-side combine — scan-bound at 100 TB, state bounded by the
        |number of power-of-two buckets (< 64), never the corpus.""".stripMargin,
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS l
        |  FROM documents),
        |b AS (
        |  SELECT l,
        |    CASE WHEN l <= 1 THEN 1
        |         ELSE CAST(power(2, length(bin(l - 1))) AS BIGINT) END AS bucket_cap
        |  FROM t)
        |SELECT bucket_cap, count(*)::BIGINT AS n_docs,
        |  CAST(sum(l) AS BIGINT) AS sum_tokens,
        |  CAST(count(*) * bucket_cap - sum(l) AS BIGINT) AS pad_tokens,
        |  (1000 * CAST(count(*) * bucket_cap - sum(l) AS BIGINT))
        |    // (count(*) * bucket_cap) AS waste_pm,
        |  CAST(sum(512 - least(l, 512)) AS BIGINT) AS pad512_tokens,
        |  CAST(sum(greatest(l - 512, 0)) AS BIGINT) AS trunc512_tokens
        |FROM b GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(size(split(col("text"), " ")).cast("bigint").as("l"))
        .withColumn("bucket_cap",
          expr("""CASE WHEN l <= 1 THEN 1L
                 |ELSE CAST(power(2, length(bin(l - 1))) AS BIGINT) END""".stripMargin))
        .groupBy(col("bucket_cap"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          sum(col("l")).cast("bigint").as("sum_tokens"),
          (count(lit(1)) * col("bucket_cap") - sum(col("l")))
            .cast("bigint").as("pad_tokens"),
          expr("""(1000 * CAST(count(1) * bucket_cap - sum(l) AS BIGINT))
                 |DIV (count(1) * bucket_cap)""".stripMargin).as("waste_pm"),
          sum(lit(512L) - least(col("l"), lit(512L))).cast("bigint").as("pad512_tokens"),
          sum(greatest(col("l") - 512L, lit(0L))).cast("bigint").as("trunc512_tokens"))
    },

    // ----------------------------------------------------------------
    q("q259_nextfit_packing",
      """Doc-boundary sequence packing by NEXT-FIT — the online greedy
        |that T5-style loaders actually run when documents must not be
        |split across training sequences (Raffel et al. 2020 §3.1.2;
        |Krell et al. 2021, arXiv 2107.02027, study exactly this
        |packing-efficiency question; next-fit is the classic bin-
        |packing baseline with the 2x-of-optimal guarantee, Johnson
        |1973). Per source in doc_id order, window W=128: a doc longer
        |than W is truncated to W (no splitting), a doc that no longer
        |fits closes the current bin. Census per source: docs, packed
        |tokens, bins used, the ceil(total/W) lower bound (what q99's
        |concat-and-chunk achieves by splitting docs), fill permille,
        |and truncation loss. The recurrence fill' = (fill + l > W ?
        |l : fill + l) is state-dependent — NOT a prefix sum — so the
        |engine runs it as the funnel kernel does: hash-repartition by
        |source (ONE shuffle), spill-safe local sort by (source,
        |doc_id), and a single mapPartitions scan holding O(1) state
        |per source; the oracle pins the same recurrence as a DuckDB
        |recursive CTE stepping one doc per source per iteration.
        |Scale shape: shuffle carries (source, doc_id, two ints) —
        |never text; output is |sources| rows; a skewed source costs
        |one long sorted run, the exact trade the funnel tier already
        |documents.""".stripMargin,
      """WITH RECURSIVE t AS (
        |  SELECT source,
        |    CAST(least(len(string_split(text, ' ')), 128) AS BIGINT) AS l,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS raw,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |s AS (
        |  SELECT source, rn, l AS fill, CAST(1 AS BIGINT) AS bins
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.source, t.rn,
        |    CASE WHEN s.fill + t.l > 128 THEN t.l ELSE s.fill + t.l END,
        |    s.bins + CASE WHEN s.fill + t.l > 128 THEN 1 ELSE 0 END
        |  FROM s JOIN t ON t.source = s.source AND t.rn = s.rn + 1),
        |f AS (SELECT source, max(rn) AS n_docs FROM t GROUP BY 1),
        |a AS (SELECT source, CAST(sum(l) AS BIGINT) AS packed_tokens,
        |        CAST(sum(raw - l) AS BIGINT) AS trunc_tokens
        |      FROM t GROUP BY 1)
        |SELECT f.source, CAST(f.n_docs AS BIGINT) AS n_docs, a.packed_tokens,
        |  s.bins AS n_bins,
        |  (a.packed_tokens + 127) // 128 AS lb_bins,
        |  (1000 * a.packed_tokens) // (s.bins * 128) AS fill_pm,
        |  a.trunc_tokens
        |FROM f
        |JOIN s ON s.source = f.source AND s.rn = f.n_docs
        |JOIN a ON a.source = f.source""".stripMargin) { (s, dir) =>
      nextFitCensus(Tables.documents(s, dir), 128L)
    },

    // ----------------------------------------------------------------
    q("q262_weighted_sample",
      """Weighted sampling WITHOUT replacement, cluster-deterministic —
        |Efraimidis & Spirakis 2006's A-ES: each doc draws key
        |u^(1/w) (u uniform, w = token count) and the k largest keys
        |are the sample, which selects with probability proportional
        |to weight and no replacement — the principled way to
        |subsample a corpus by token mass rather than doc count
        |(q81's gate is per-STRATUM uniform; this is per-DOC
        |weighted). Determinism: u comes from the q81 affine hash
        |family (constants 37/11 — rand() reseeds per partition and
        |cannot reproduce across cluster sizes), and the log that
        |u^(1/w) needs is q256's shared-constant quantized dyadic
        |log2 — maximizing u^(1/w) is minimizing (log2(M) -
        |log2(u))/w, all BIGINT: ratio_nano = ((31e6 -
        |log2micro(h)) * 1000) DIV w with M = 2^31 an exact 31e6
        |micro-bits. Both engines rank the SAME integers, ties break
        |on doc_id. Scale shape: the key is scan-side row-local
        |arithmetic; selection is TakeOrdered k=100 (per-partition
        |top-k + k·|partitions| merge — never a global sort
        |materialization); output is k rows.""".stripMargin, {
        val l2 = TextOps.log2MicroDuck(s"(((37 * doc_id + 11) % $P) + 1)")
        s"""WITH t AS (
          |  SELECT doc_id, source,
          |    greatest(CAST(len(string_split(text, ' ')) AS BIGINT), 1) AS w,
          |    ((31000000 - $l2) * 1000) AS keynum
          |  FROM documents)
          |SELECT doc_id, source, w, keynum // w AS ratio_nano
          |FROM t ORDER BY keynum // w, doc_id LIMIT 100""".stripMargin
      }) { (s, dir) =>
      val l2 = TextOps.log2MicroSpark(s"(((37 * doc_id + 11) % $P) + 1)")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          greatest(size(split(col("text"), " ")).cast("bigint"), lit(1L)).as("w"),
          expr(s"((31000000 - $l2) * 1000)").as("keynum"))
        .select(col("doc_id"), col("source"), col("w"),
          expr("keynum DIV w").as("ratio_nano"))
        .orderBy(col("ratio_nano"), col("doc_id"))
        .limit(100)
    })

  /** The next-fit packer's whole state: five longs, O(1) per source.
    * `step` IS the recurrence — shared verbatim by the batch kernel
    * ([[nextFitCensus]]'s sorted scan) and the streaming twin
    * ([[graft.streaming.StreamPack]]'s keyed state), so the stream ≡
    * batch proof covers the exact code path, not a transcription. */
  final case class PackState(
      nDocs: Long, packed: Long, bins: Long, fill: Long, trunc: Long) {
    /** One doc: `l` = token length already truncated to the window,
      * `tr` = tokens lost to that truncation, `w` = the window. */
    def step(l: Long, tr: Long, w: Long): PackState =
      if (bins == 0L || fill + l > w)
        PackState(nDocs + 1L, packed + l, bins + 1L, l, trunc + tr)
      else
        PackState(nDocs + 1L, packed + l, bins, fill + l, trunc + tr)
  }
  object PackState { val empty: PackState = PackState(0L, 0L, 0L, 0L, 0L) }

  /** q259's packing core over an arbitrary (source, doc_id, text)
    * frame: next-fit doc-boundary packing at window `w`, docs consumed
    * in doc_id order per source, oversize docs truncated to `w`. One
    * hash shuffle + spill-safe local sort + a single mapPartitions
    * scan holding O(1) per-source state — the funnel kernel's exact
    * discipline (Funnel.run). Shared by batch q259 and the streaming
    * twin ([[graft.streaming.StreamPack]]). */
  private[graft] def nextFitCensus(docs: DataFrame, w: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"),
        col("doc_id").cast("long").as("doc_id"),
        size(split(col("text"), " ")).cast("long").as("raw"))
      .withColumn("l", least(col("raw"), lit(w)))
      .select(col("source"), col("doc_id"), col("l"),
        (col("raw") - col("l")).as("tr"))
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .as[(String, Long, Long, Long)]
      .mapPartitions { iter =>
        // contiguous source runs after the sort: the in-flight state is
        // one PackState (five longs) — never a bin list or doc history
        new Iterator[(String, Long, Long, Long, Long)] {
          private var cur: String = null
          private var st = PackState.empty
          private var open = false
          private var pending: (String, Long, Long, Long, Long) = _
          private def close(): Unit =
            pending = (cur, st.nDocs, st.packed, st.bins, st.trunc)
          private def advance(): Unit = {
            while (pending == null && iter.hasNext) {
              val (src, _, l, tr) = iter.next()
              if (open && src != cur) { close(); st = PackState.empty }
              cur = src; open = true
              st = st.step(l, tr, w)
            }
            if (pending == null && !iter.hasNext && open) {
              close(); open = false
            }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): (String, Long, Long, Long, Long) = {
            advance(); val r = pending; pending = null; r
          }
        }
      }
      .toDF("source", "n_docs", "packed_tokens", "n_bins", "trunc_tokens")
      .select(col("source"), col("n_docs"), col("packed_tokens"), col("n_bins"),
        expr(s"(packed_tokens + ${w - 1}) DIV $w").as("lb_bins"),
        expr(s"(1000 * packed_tokens) DIV (n_bins * $w)").as("fill_pm"),
        col("trunc_tokens"))
  }

  /** q246's trained per-doc margins (doc_id, source, y, s) over an
    * arbitrary (doc_id, text, source) frame — the scoring seam the
    * ML-evaluation tier (q284–q286, [[MlEval]]) reads, and the
    * trainable core QualityClassifierSpec's separable fixtures drive.
    * See the q246 registration for semantics and the scale argument. */
  private[graft] def perceptronScores(docs: DataFrame,
      refSources: Seq[String], passes: Int): DataFrame =
    perceptronScoresStaged(docs, refSources, passes, graft.Graft.stagedCheckpoint)

  /** Session-cached trained margins for the REGISTERED corpus — one
    * training shared by q246 and the ML-eval tier (the `perceptron`
    * cache family). The embedded feature checkpoint must outlive the
    * building execution (the cached frame's lineage references it), so
    * it goes through cacheScopedCheckpoint — released by clearCaches
    * together with the owning entry, the cluster-label precedent. */
  private val perceptronScoreCache = new Dedup.SessionCache
  private[graft] def trainedScores(s: SparkSession, dir: String): DataFrame =
    perceptronScoreCache.getOrElseUpdate(s, dir) {
      perceptronScoresStaged(Tables.documents(s, dir), Seq("src1", "src2"), 3,
        graft.Graft.cacheScopedCheckpoint).cache()
    }

  private def perceptronScoresStaged(docs: DataFrame,
      refSources: Seq[String], passes: Int,
      stage: DataFrame => DataFrame): DataFrame = {
    val fj = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .select(col("doc_id"),
        expr("CAST(conv(substr(md5(tok), 1, 2), 16, 10) AS INT)").as("j"))
      .distinct()
    val lab = docs.select(col("doc_id"), col("source"),
      when(col("source").isin(refSources: _*), 1L).otherwise(-1L).as("y"))
    // one corpus scan, staged once: feeds every training pass AND the
    // final scoring (released deterministically after the execution)
    val feats = stage(
      fj.union(docs.select(col("doc_id"), lit(256).as("j")))
        .join(lab, Seq("doc_id")))
    // the model lives on the driver: 257 longs, collected once per
    // pass from the 257-row gradient agg (bounded by the feature
    // space, never the corpus — the q129/q209 driver-data discipline)
    val w = Array.fill[Long](257)(0L)
    def score = sum(element_at(typedLit(w.toSeq), col("j") + 1))
    for (_ <- 1 to passes) {
      val errDocs = feats.groupBy(col("doc_id"), col("y"))
        .agg(score.as("s"))
        .filter(col("y") * col("s") <= 0)
        .select(col("doc_id"))
      feats.join(errDocs, Seq("doc_id"), "left_semi")
        .groupBy(col("j")).agg(sum(col("y")).as("g"))
        .collect() // <= 257 rows: the batch-perceptron update
        .foreach(r => w(r.getInt(0)) += r.getLong(1))
    }
    feats.groupBy(col("doc_id"), col("source"), col("y"))
      .agg(score.cast("long").as("s"))
  }

  /** q246's selection census over a trained-margins frame. */
  private[graft] def perceptronCensusOf(scores: DataFrame): DataFrame =
    scores.groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("s") > 0, 1L).otherwise(0L)).cast("bigint").as("n_selected"),
        sum(col("s")).cast("bigint").as("margin_sum"))

  /** q246's census on a fresh (uncached) training — the spec seam. */
  private[graft] def perceptronCensus(docs: DataFrame,
      refSources: Seq[String], passes: Int): DataFrame =
    perceptronCensusOf(perceptronScores(docs, refSources, passes))

  /** The q246 oracle's CTE chain through `sf` (doc_id, s) and `y`
    * (doc_id, y) — the three unrolled perceptron passes. Shared by
    * q246's census oracle and the ML-evaluation oracles (q284–q286),
    * so every consumer trains the IDENTICAL model. Lazy: `defs` above
    * initializes first and its oracle strings interpolate this (the
    * log2MantMicro precedent). */
  private[graft] lazy val perceptronOracleCtes: String = {
    val hx = "'0123456789abcdef'"
    val passes = (1 to 3).map { k =>
      s"""s$k AS (SELECT f.doc_id, CAST(sum(w) AS BIGINT) AS s
         |  FROM feats f JOIN w${k - 1} USING (j) GROUP BY 1),
         |e$k AS (SELECT y.doc_id, y.y FROM y JOIN s$k USING (doc_id)
         |  WHERE y.y * s$k.s <= 0),
         |g$k AS (SELECT j, CAST(sum(y) AS BIGINT) AS g
         |  FROM feats JOIN e$k USING (doc_id) GROUP BY 1),
         |w$k AS (SELECT w${k - 1}.j, w${k - 1}.w + coalesce(g$k.g, 0) AS w
         |  FROM w${k - 1} LEFT JOIN g$k USING (j))""".stripMargin
    }.mkString(",\n")
    s"""tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
       |  FROM documents),
       |fj AS (SELECT DISTINCT doc_id,
       |    (strpos($hx, substr(md5(tok), 1, 1)) - 1) * 16
       |      + strpos($hx, substr(md5(tok), 2, 1)) - 1 AS j
       |  FROM tok),
       |feats AS (SELECT doc_id, j FROM fj
       |  UNION ALL SELECT doc_id, 256 AS j FROM documents),
       |y AS (SELECT doc_id,
       |    CASE WHEN source IN ('src1', 'src2') THEN 1 ELSE -1 END AS y
       |  FROM documents),
       |w0 AS (SELECT unnest(range(0, 257)) AS j, CAST(0 AS BIGINT) AS w),
       |$passes,
       |sf AS (SELECT f.doc_id, CAST(sum(w) AS BIGINT) AS s
       |  FROM feats f JOIN w3 USING (j) GROUP BY 1)""".stripMargin
  }

  /** q217's scan-side shard projection, shared VERBATIM with the
    * streaming ingest-manifest kernel ([[graft.streaming.StreamShard]]):
    * appends (ok, shard, n_toks, chk32) to whatever columns ride along
    * with (doc_id, text, n_chars) and drops text. The checksum is the
    * first 32 bits of md5(text) as a BIGINT — the substr/instr/md5
    * spelling is common to Spark SQL and DuckDB, so the oracle embeds
    * the same expression via [[chk32Sql]]. */
  private[graft] def shardColumns(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("ok", (col("doc_id") * 31L + 7L) % P)
      .withColumn("shard", col("ok") % 16)
      .withColumn("n_toks",
        expr("CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)"))
      .withColumn("chk32", expr(chk32Sql("text")))
      .drop("text")

  /** The per-shard manifest aggregates over [[shardColumns]] output. */
  private[graft] def shardManifestAggs: Seq[org.apache.spark.sql.Column] = Seq(
    count(lit(1)).cast("bigint").as("n_docs"),
    sum(col("n_chars")).cast("bigint").as("n_bytes"),
    sum(col("n_toks")).cast("bigint").as("n_tokens"),
    sum(col("chk32")).cast("bigint").as("content_checksum"),
    expr("min_by(doc_id, ok)").as("first_doc"),
    expr("max_by(doc_id, ok)").as("last_doc"))

  /** First 32 bits of md5($c) as a BIGINT, spelled in the md5/substr/
    * instr subset both engines parse identically (each hex nibble
    * looked up positionally, weighted by 16^(8-i)). */
  private[graft] def chk32Sql(c: String): String =
    (1 to 8).map { i =>
      val w = 1L << (4 * (8 - i))
      s"(instr('0123456789abcdef', substr(md5($c), $i, 1)) - 1) * CAST($w AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** q204's per-doc corpus-bigram LM score (doc_id, lang, lm_score) —
    * q135's integer fixed-point formula, carried with the language key
    * for the tercile cut. Per-doc bigram counts are staged once
    * (localCheckpoint): they feed the model build AND the scoring
    * join. */
  /** Session-cached per-doc bigram count table shared by the whole
    * n-gram model tier — q135 (MLE LM), q248 (Kneser-Ney), q203 (DSIR)
    * and q204 (CCNet buckets) all tokenize the same corpus into the
    * same (doc, bigram) counts and differ only in the model they fit on
    * top. The grouping keys carry the doc-level attributes each
    * consumer needs (lang for q204, the src1/src2 target flag for
    * q203); both are FUNCTIONS of doc_id, so the extra keys change no
    * count and each consumer projects just its columns. One corpus
    * tokenize+explode pass per (session, sfDir) instead of four — the
    * staged-derived-table move of a production pipeline (tokenize once,
    * fit many models); the four consumers form the `bigram` cache
    * family (Graft.cacheFamilies), staged in the first member's warm-up
    * and dropped at the family boundary. */
  private val bigramCache = new Dedup.SessionCache
  private[operators] def docBigrams(s: SparkSession, dir: String): DataFrame =
    bigramCache.getOrElseUpdate(s, dir) {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          col("source").isin("src1", "src2").as("tgt"),
          split(lower(col("text")), " ").as("w"))
        .select(col("doc_id"), col("lang"), col("tgt"), explode(expr(
          """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
            |  (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("bg"))
        .select(col("doc_id"), col("lang"), col("tgt"),
          col("bg.a").as("a"), col("bg.b").as("b"))
        .groupBy(col("doc_id"), col("lang"), col("tgt"), col("a"), col("b"))
        .agg(count(lit(1)).as("k"))
        // cacheScopedCheckpoint, not .cache(): each consumer reads this
        // frame through 2-3 plan branches per execution, and a
        // checkpoint stores UnsafeRows (cheap to re-read, lineage
        // truncated for the planner) where an InMemoryRelation pays
        // columnar ser/de per read. Released by clearCaches at the
        // bigram family boundary, like the cluster-labels frame.
        .transform(graft.Graft.cacheScopedCheckpoint)
    }

  /** Session-cached per-doc LM score moments (doc_id, lang, nb, sp) —
    * the expensive half of the corpus-bigram MLE model: fit the pair/
    * left-context tables and run the bigram-keyed scoring join ONCE per
    * (session, sfDir). q135 projects (doc_id, nb, sp DIV nb) from it
    * and q204 reads it TWICE per execution (tercile thresholds + the
    * bucketing join) — before r17 that meant q204 re-ran the whole
    * model join per consumer branch per rep (its residual 1.06-1.57 s,
    * VERDICT r16 #6). The staged frame is doc-sized — the §8 "decide
    * with small rows" discipline — and lives in the bigram family like
    * the count table it derives from. (lang rides along as a grouping
    * key: it is a function of doc_id, so the aggregates are unchanged
    * and each consumer projects its columns — same argument as
    * docBigrams' extra keys.) */
  private val lmScoreCache = new Dedup.SessionCache
  private[graft] def lmScored(s: SparkSession, dir: String): DataFrame =
    lmScoreCache.getOrElseUpdate(s, dir) {
      val db = docBigrams(s, dir)
        .select(col("doc_id"), col("lang"), col("a"), col("b"), col("k"))
      val pair = db.groupBy(col("a"), col("b")).agg(sum(col("k")).as("cab"))
      val lft = pair.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
      db.join(pair, Seq("a", "b")).join(lft, Seq("a"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("k")).cast("bigint").as("nb"),
          sum(col("k") * expr("(cab * 1000000) DIV ca")).as("sp"))
        // cacheScopedCheckpoint like docBigrams: multiple plan-branch
        // reads per consumer, UnsafeRow re-reads beat columnar ser/de
        .transform(graft.Graft.cacheScopedCheckpoint)
    }

  private[graft] def lmScores(s: SparkSession, dir: String): DataFrame =
    lmScored(s, dir).select(col("doc_id"), col("lang"),
      expr("sp DIV nb").cast("bigint").as("lm_score"))

  /** q204's per-language tercile boundaries (lang, b1, b2) by
    * histogram inversion: a lang x distinct-score count agg, a
    * lang-partitioned running sum over those DISTINCT-score rows
    * (window state bounded by the fixed-point score DOMAIN, not by
    * |docs|), and a |langs|-row threshold extraction. This is the
    * OFFLINE model-building half of the CCNet split; the streaming
    * census (streaming/StreamBuckets) consumes its output as a
    * static broadcast. */
  private[graft] def tercileThresholds(sc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = sc.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val dist = sc.groupBy(col("lang"), col("lm_score"))
      .agg(count(lit(1)).as("c"))
    // running sum over DISTINCT-score rows: no order-key peers, so the
    // default RANGE..CURRENT ROW frame equals ROWS in both engines
    val cum = dist.withColumn("cum", sum(col("c")).over(
      Window.partitionBy(col("lang")).orderBy(col("lm_score").desc)))
    cum.join(broadcast(n), Seq("lang"))
      .groupBy(col("lang"))
      .agg(max(when(col("cum") >= expr("(n + 2) DIV 3"), col("lm_score"))).as("b1"),
        max(when(col("cum") >= expr("(2 * n + 2) DIV 3"), col("lm_score"))).as("b2"))
  }

  /** The value-based bucket assignment shared verbatim by batch q204
    * and its streaming twin — requires lm_score, b1, b2 in scope
    * (i.e. after the threshold join). Ties at a boundary land in the
    * better bucket. */
  private[graft] def bucketExpr: Column =
    when(col("lm_score") >= col("b1"), "head")
      .when(col("lm_score") >= col("b2"), "middle")
      .otherwise("tail")

  /** DuckDB oracle for q129: `k` BPE merge rounds unrolled as CTEs.
    * Round n: extract the bracketed symbol list, count adjacent pairs
    * (zipped unnest of s[1:len-1] with s[2:len] — overlapping adjacency,
    * matching the trainer), pick the (count DESC, left, right) winner,
    * and apply it corpus-wide with `replace()` over the bracketed
    * rendering (see the q129 doc for why that IS non-overlapping
    * left-to-right BPE application). Validated merge-for-merge against
    * BpeTrainer.trainLocal on sf0.01. */
  // Bracketed-symbol rendering shared by the whole BPE tier (q129's
  // oracle, q136 encode, q140 vocab): every non-space char wraps as
  // S1+c+S2, so one merge application is ONE plain replace() — see the
  // q136 doc for why that is exactly non-overlapping left-to-right BPE.
  private[graft] val S1 = "\u0001"
  private[graft] val S2 = "\u0002"
  /** q176's greedy MMR kernel over a (vec_id, rel, vm) relevance frame:
    * TakeOrdered the `poolSize` most relevant rows, collapse them to ONE
    * array row, and run the `picks`-round greedy recursion as a single
    * `aggregate` fold with (sel, selv, rem) state — executor-side, no
    * driver collect, one stage. Each round's argmax ((mmr desc, vec_id)
    * comparator) is let-bound exactly once via a single-element
    * transform: lambda variables evaluate once per binding, which is
    * what keeps the expression tree linear (a withColumn unroll
    * triggers CollapseProject inlining — measured 426 KB of duplicated
    * subtrees that ran slower than per-round joins). int64 fixed-point
    * dots throughout, so the picks are bit-identical to the DuckDB
    * oracle's recursive CTE and to the in-memory reference
    * (TrainingOpsSpec property test). `get()` not `[..]`: a pool
    * shorter than `picks` (or empty input) yields null picks that the
    * final isNotNull filter drops. */
  private[graft] def mmrSelect(rel: DataFrame, poolSize: Int, picks: Int): DataFrame = {
    require(picks >= 2, "sequence(2, picks) needs picks >= 2")
    val byRel = "(l, r) -> CASE WHEN l.rel > r.rel THEN -1" +
      " WHEN l.rel < r.rel THEN 1 WHEN l.vec_id < r.vec_id THEN -1" +
      " WHEN l.vec_id > r.vec_id THEN 1 ELSE 0 END"
    val byMmr = "(l, r) -> CASE WHEN l.mmr > r.mmr THEN -1" +
      " WHEN l.mmr < r.mmr THEN 1 WHEN l.vec_id < r.vec_id THEN -1" +
      " WHEN l.vec_id > r.vec_id THEN 1 ELSE 0 END"
    val dot = "aggregate(zip_with(c.vm, s2.vm, (x, y) -> x * y)," +
      " CAST(0 AS BIGINT), (a, v) -> a + v)"
    val scored = "transform(st.rem, c -> named_struct('vec_id', c.vec_id," +
      s" 'rel', c.rel, 'vm', c.vm, 'mmr', c.rel - array_max(transform(st.selv, s2 -> $dot))))"
    val step = s"get(transform(array(get(array_sort($scored, $byMmr), 0))," +
      " p -> named_struct(" +
      "'sel', concat(st.sel, array(named_struct('pick_order', CAST(r AS BIGINT)," +
      " 'vec_id', p.vec_id, 'rel', p.rel, 'mmr', p.mmr)))," +
      "'selv', concat(st.selv, array(named_struct('vec_id', p.vec_id," +
      " 'rel', p.rel, 'vm', p.vm)))," +
      "'rem', filter(st.rem, c2 -> c2.vec_id != p.vec_id))), 0)"
    rel.orderBy(col("rel").desc, col("vec_id")).limit(poolSize)
      .agg(collect_list(struct(col("vec_id"), col("rel"), col("vm"))).as("pool0"))
      .withColumn("pool", expr(s"array_sort(pool0, $byRel)"))
      .withColumn("state0", expr(
        "named_struct(" +
          "'sel', array(named_struct('pick_order', CAST(1 AS BIGINT)," +
          " 'vec_id', get(pool, 0).vec_id, 'rel', get(pool, 0).rel," +
          " 'mmr', get(pool, 0).rel))," +
          "'selv', array(get(pool, 0))," +
          "'rem', slice(pool, 2, greatest(size(pool) - 1, 0)))"))
      .withColumn("fin", expr(
        s"aggregate(sequence(2, $picks), state0, (st, r) -> $step)"))
      .select(explode(col("fin.sel")).as("p"))
      .where(col("p.vec_id").isNotNull)
      .select(col("p.pick_order").as("pick_order"), col("p.vec_id").as("vec_id"),
        col("p.rel").as("rel_score"), col("p.mmr").as("mmr_score"))
  }

  private[graft] def bpeBracketCol(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(textCol, "(\\S)", S1 + "$1" + S2)
  private[graft] def bpeEncodeCol(
      merges: Seq[BpeTrainer.Merge],
      textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    merges.foldLeft(bpeBracketCol(textCol)) { (c, m) =>
      call_function("replace", c,
        lit(S1 + m.left + S2 + S1 + m.right + S2),
        lit(S1 + m.left + m.right + S2))
    }

  private[graft] def bpeOracleSql(k: Int): String = {
    val unions = (1 to k).map { n =>
      s"""SELECT $n::BIGINT AS rank, a AS "left", b AS "right", cnt AS pair_count FROM b$n"""
    }.mkString("\nUNION ALL ")
    s"""WITH ${bpeRoundsCtes(k)}
       |$unions
       |ORDER BY rank""".stripMargin
  }

  /** The shared WITH-body of the BPE oracles: the bracketed word
    * histogram (w1) plus `k` training rounds (s/p/b/w CTEs per round —
    * symbol extraction, pair counts, winner, merge application). */
  private def bpeRoundsCtes(k: Int): String = {
    val rounds = (1 to k).map { n =>
      s"""s$n AS (SELECT regexp_extract_all(w, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1) AS s, f, w FROM w$n),
         |p$n AS (
         |  SELECT a, b, sum(f)::BIGINT AS cnt FROM (
         |    SELECT unnest(s[1:len(s)-1]) AS a, unnest(s[2:len(s)]) AS b, f FROM s$n)
         |  GROUP BY 1, 2),
         |b$n AS (SELECT a, b, cnt FROM p$n ORDER BY cnt DESC, a, b LIMIT 1),
         |w${n + 1} AS (
         |  SELECT replace(w, chr(1) || a || chr(2) || chr(1) || b || chr(2),
         |                    chr(1) || a || b || chr(2)) AS w, f
         |  FROM w$n, b$n)""".stripMargin
    }.mkString(",\n")
    s"""w1 AS (
       |  SELECT regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS w, count(*)::BIGINT AS f
       |  FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents)
       |  WHERE length(w) > 0
       |  GROUP BY 1),
       |$rounds""".stripMargin
  }

  /** The nested-replace SQL expression encoding `text` with the `k`
    * learned merges (each bN a single-row CTE from [[bpeRoundsCtes]]). */
  private def bpeEncodeExpr(k: Int): String = {
    val enc0 = """regexp_replace(text, '(\S)', chr(1) || '\1' || chr(2), 'g')"""
    (1 to k).foldLeft(enc0) { (e, n) =>
      s"replace($e, chr(1) || b$n.a || chr(2) || chr(1) || b$n.b || chr(2), chr(1) || b$n.a || b$n.b || chr(2))"
    }
  }

  /** DuckDB oracle for q136: re-learn the `k` merges (same round CTEs
    * as q129's oracle), then encode every document by nesting `k`
    * replace() calls over the bracketed rendering of its text — the
    * merge table rides in as `k` single-row CTE cross joins. Token
    * counts fall out of chr(1)-mark counting by length difference,
    * mirroring the Spark side exactly. */
  private[graft] def bpeEncodeOracleSql(k: Int): String = {
    val froms = (1 to k).map(n => s"b$n").mkString(", ")
    s"""WITH ${bpeRoundsCtes(k)},
       |enc AS (
       |  SELECT doc_id,
       |    length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_syms,
       |    ${bpeEncodeExpr(k)} AS e
       |  FROM documents, $froms)
       |SELECT doc_id, n_syms,
       |  (length(e) - length(replace(e, chr(1), '')))::BIGINT AS n_tokens,
       |  (n_syms - (length(e) - length(replace(e, chr(1), ''))))::BIGINT AS n_merges_applied
       |FROM enc""".stripMargin
  }

  /** DuckDB oracle for q193: encode as in q136's oracle, then roll
    * non-space char and token counts up per source with the floor-div
    * rate. */
  private[graft] def bpeTokenRateOracleSql(k: Int): String = {
    val froms = (1 to k).map(n => s"b$n").mkString(", ")
    s"""WITH ${bpeRoundsCtes(k)},
       |enc AS (
       |  SELECT source,
       |    length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_chars,
       |    ${bpeEncodeExpr(k)} AS e
       |  FROM documents, $froms),
       |t AS (
       |  SELECT source, n_chars,
       |    (length(e) - length(replace(e, chr(1), '')))::BIGINT AS n_tokens
       |  FROM enc)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  (1000 * CAST(sum(n_tokens) AS BIGINT)) // CAST(sum(n_chars) AS BIGINT)
       |    AS tokens_per_kilochar
       |FROM t GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for q210: encode as in q136's oracle, then roll
    * word/char/token counts up per LANGUAGE with the floor-div
    * fertility and chars-per-token milli-ratios. */
  private[graft] def bpeFertilityOracleSql(k: Int): String = {
    val froms = (1 to k).map(n => s"b$n").mkString(", ")
    s"""WITH ${bpeRoundsCtes(k)},
       |enc AS (
       |  SELECT lang,
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
       |      AS n_words,
       |    length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS n_chars,
       |    ${bpeEncodeExpr(k)} AS e
       |  FROM documents, $froms),
       |t AS (
       |  SELECT lang, n_words, n_chars,
       |    (length(e) - length(replace(e, chr(1), '')))::BIGINT AS n_tokens
       |  FROM enc)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS total_words,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  (1000 * CAST(sum(n_tokens) AS BIGINT)) // CAST(sum(n_words) AS BIGINT)
       |    AS fertility_milli,
       |  (1000 * CAST(sum(n_chars) AS BIGINT)) // CAST(sum(n_tokens) AS BIGINT)
       |    AS chars_per_token_milli
       |FROM t GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for q140: encode as in q136's oracle, then recover
    * the token stream by regex over the bracketed encoding and count
    * corpus + document frequency per token. */
  private[graft] def bpeVocabOracleSql(k: Int): String = {
    val froms = (1 to k).map(n => s"b$n").mkString(", ")
    s"""WITH ${bpeRoundsCtes(k)},
       |enc AS (
       |  SELECT doc_id, ${bpeEncodeExpr(k)} AS e
       |  FROM documents, $froms),
       |t AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(e, chr(1) || '([^' || chr(2) || ']*)' || chr(2), 1)) AS token
       |  FROM enc)
       |SELECT token, count(*)::BIGINT AS cnt,
       |  count(DISTINCT doc_id)::BIGINT AS df
       |FROM t GROUP BY token
       |ORDER BY cnt DESC, token LIMIT 30""".stripMargin
  }
}
