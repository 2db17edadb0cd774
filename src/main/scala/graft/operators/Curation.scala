package graft.operators

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline: the §2.11 operators
  * composed the way a 100 TB pre-training corpus job actually runs them.
  *
  *   1. quality filter (token count window + stopword ratio — Gopher-ish;
  *      the stopword-presence test doubles as the language marker, so
  *      quality+lang collapse into one predicate)
  *   2. exact dedup (normalized-text fingerprint, min-doc_id survivor)
  *   3. near-dup removal (MinHash-LSH candidates → exact Jaccard >= 0.2;
  *      drop the higher doc_id of a verified pair ONLY when its lower
  *      partner ships — if the partner was filtered out, the higher doc
  *      is the sole copy of that content and must survive)
  *   4. corpus accounting (docs + tokens per lang — what actually ships)
  *
  * Stage order: the scalar filters run first in one codegen pass over
  * the scan, so the fingerprint groupBy shuffles only surviving rows.
  * The near-dup pair graph is DELIBERATELY computed corpus-wide via
  * Dedup.neardupPairs — it is shared (cached) with q28/q29/q68 rather
  * than recomputed per filter state, and the survivor condition is
  * applied to the tiny pair list, not the corpus. Near-dup removal then
  * joins a provably-small drop list, so it is a broadcast anti-join on
  * the big side.
  */
object Curation {

  val defs: Seq[QueryDef] = Seq(
    q("q63_curation_pipeline",
      """Full curation pipeline output accounting: per-lang surviving doc
        |and token counts after quality filter -> lang filter -> exact
        |dedup -> near-dup removal. One number pair per lang — the
        |strongest whole-pipeline cross-engine check (any stage drifting
        |by one doc changes the totals).""".stripMargin,
      s"""WITH jp AS (${Dedup.neardupSql}),
        |feat AS (
        |  SELECT doc_id, lang,
        |    md5(regexp_replace(lower(text), '[ \\t\\n\\r\\f]+', ' ', 'g')) AS f,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop
        |  FROM documents),
        |qual AS (
        |  SELECT * FROM feat
        |  WHERE n_tokens BETWEEN 20 AND 1000
        |    AND CAST(n_stop AS DOUBLE) / n_tokens >= 0.01),
        |surv AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY f),
        |drop_b AS (
        |  SELECT DISTINCT doc_b AS doc_id FROM jp
        |  WHERE doc_a IN (SELECT doc_id FROM qual)),
        |kept AS (
        |  SELECT q.lang, q.n_tokens FROM qual q
        |  JOIN surv s ON s.doc_id = q.doc_id
        |  WHERE q.doc_id NOT IN (SELECT doc_id FROM drop_b))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM kept GROUP BY lang""".stripMargin) { (s, dir) =>
      val stopList = TextOps.Stopwords.map(w => s"'$w'").mkString(",")
      val feat = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        md5(regexp_replace(lower(col("text")), "[ \\t\\n\\r\\f]+", " ")).as("f"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        size(expr(s"filter(split(text, ' '), x -> x IN ($stopList))"))
          .cast("bigint").as("n_stop"))
      // stage 1: one codegen'd filter pass over the scan (the stop-ratio
      // conjunct subsumes the language-marker test: ratio >= 0.01
      // implies n_stop >= 1)
      val qual = feat.filter(
        col("n_tokens").between(20, 1000) &&
          col("n_stop").cast("double") / col("n_tokens") >= 0.01)
      // stage 2: exact-dedup survivors (min doc_id per fingerprint),
      // rejoined as a semi-filter so kept rows keep their columns
      val surv = qual.groupBy(col("f")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      // stage 3: near-dup drop list — verified pairs whose LOWER partner
      // survived the filters (else the higher doc is the only copy of
      // that content and must ship); pair list is tiny, broadcast
      val dropB = broadcast(Dedup.neardupPairs(s, dir))
        .join(qual.select(col("doc_id").as("doc_a")), Seq("doc_a"))
        .select(col("doc_b").as("doc_id")).distinct()
      val kept = qual
        .join(surv, Seq("doc_id"), "left_semi")
        .join(broadcast(dropB), Seq("doc_id"), "left_anti")
      // stage 4: corpus accounting
      kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("bigint").as("total_tokens"))
    },

    // ----------------------------------------------------------------
    q("q68_dup_clusters",
      """Duplicate-cluster formation: connected components of the
        |verified near-dup graph, each doc labeled with its component's
        |min doc_id (the canonical survivor). Implemented as iterative
        |min-label propagation over DataFrames — O(diameter) rounds, each
        |one join + one aggregate, lineage cut per round with
        |localCheckpoint; this is the shape that scales where a
        |recursive CTE (the DuckDB oracle here) or union-find on the
        |driver cannot. Cluster sizes ride the final label
        |partitioning.""".stripMargin,
      s"""WITH RECURSIVE jp AS (${Dedup.neardupSql}),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM jp
        |          UNION ALL SELECT doc_b, doc_a FROM jp),
        |nodes AS (SELECT DISTINCT a AS d FROM edges),
        |walk(d, lbl) AS (
        |  SELECT d, d FROM nodes
        |  UNION
        |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.d
        |  WHERE w.lbl < e.b),
        |lab AS (SELECT d AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY d)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val pairs = Dedup.neardupPairs(s, dir).select(col("doc_a"), col("doc_b"))
      // The dup graph is orders of magnitude smaller than the corpus
      // (only verified near-dup docs appear). Size the per-round shuffle
      // to the graph, not to the session default — at corpus scale the
      // same holds: partition by |edges|, not |docs|.
      val graphParts = 4
      val edges = pairs
        .union(pairs.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst")
        .repartition(graphParts, col("src"))
        .localCheckpoint(true)
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("label", col("doc_id"))
        .repartition(graphParts, col("doc_id"))
        .localCheckpoint(true)
      var changed = true
      var iter = 0
      while (changed && iter < 50) {
        val prop = edges.join(labels, col("src") === col("doc_id"))
          .groupBy(col("dst")).agg(min(col("label")).as("nlabel"))
        val next = labels.join(prop, col("doc_id") === col("dst"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .repartition(graphParts, col("doc_id"))
          .localCheckpoint(true)
        changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
          .filter(col("label") =!= col("old")).limit(1).count() > 0
        // dead per-round checkpoint blocks are reclaimed by the
        // ContextCleaner once the dropped reference is GC'd (Dataset
        // unpersist does not reach localCheckpoint RDD storage)
        labels = next
        iter += 1
      }
      // a silent cap would return plausible-but-wrong cluster ids; a
      // >50-diameter dup chain must fail loudly instead
      if (changed) throw new IllegalStateException(
        s"q68 label propagation did not converge within $iter rounds")
      System.err.println(s"[q68] converged after $iter rounds")
      labels.select(col("doc_id"), col("label").as("cluster_id"),
        count(lit(1)).over(Window.partitionBy(col("label"))).as("cluster_size"))
    })
}
