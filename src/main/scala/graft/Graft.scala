package graft

import org.apache.spark.sql.SparkSession

/** Engine-level lifecycle hooks.
  *
  * The operator layer memoizes expensive shared frames per (session,
  * sfDir) — LSH shingles/signatures/candidates/pairs (Dedup), cluster
  * labels (Curation), the co-purchase edge/degree/orientation trio
  * (Curation, q130/q131), and the exact/codegen top-k references
  * (Similarity, q31/q34/q90/q109/q110). Each cache is the local-mode
  * analog of "stage the derived table once, fan out" and is individually
  * correct — but nothing ever unpersisted them, so a long multi-query
  * run (the 202-query bench) accumulated them all in one 8 GiB storage
  * pool until eviction forced recomputation of exactly the lineages the
  * caches were built to protect (r11: q130 ran 10× its isolated time
  * mid-suite). See SCALE.md §6 for the incident and the detection
  * signature.
  */
object Graft {

  /** Cache FAMILIES: registered queries that co-consume one session-
    * scoped helper artifact (SCALE.md branch-reuse rule: clear between
    * families, never between co-consuming queries). Bench and Verify
    * order family members adjacently and call [[clearCaches]] only at
    * family boundaries, so the artifact is staged once (in the first
    * member's unmeasured warm-up) and every member reuses it — exactly
    * how a production session amortizes a staged derived table. A query
    * outside every family is its own singleton boundary. r12 measured
    * the alternative: per-query clears made q197 rebuild q68's cluster
    * labels (0.15→0.80 s) and q31 rebuild the exact top-k its siblings
    * share (0.09→0.55 s).
    *
    * Membership list = consumers of each SessionCache:
    *  - knn: Similarity.exactCache/fastCache (exact + codegen top-k)
    *  - lsh: Dedup shingle/sig/cand/pair caches + Curation clusterCache
    *  - simhash: Dedup.simhashCache
    *  - graph: Curation edge/deg/orient/dstEdge caches
    * (BPE queries share a driver-side merge memo that clearCaches does
    * not drop, so they need no family.) */
  val cacheFamilies: Map[String, Seq[String]] = Map(
    "knn" -> Seq("q109_knn_pq", "q110_knn_pq_rerank", "q31_knn_bruteforce",
      "q34_knn_codegen", "q90_knn_ivf_probe", "q231_matryoshka_recall"),
    "lsh" -> Seq("q145_containment", "q171_minhash_calibration",
      "q197_leakage_free_split", "q28_lsh_candidates", "q29_neardup_jaccard",
      "q63_curation_pipeline", "q68_dup_clusters"),
    "simhash" -> Seq("q200_source_datasheet", "q30_simhash",
      "q77_simhash_hamming"),
    "graph" -> Seq("q130_triangle_count", "q131_pagerank",
      "q223_link_prediction"),
    "semdedup" -> Seq("q205_semdedup", "q218_prototype_pruning",
      "q232_clustering_eval"))

  /** Family id of a query — its own name when it belongs to none. */
  private val familyOf: Map[String, String] =
    cacheFamilies.flatMap { case (f, qs) => qs.map(_ -> f) }
  def family(name: String): String = familyOf.getOrElse(name, name)

  /** Global ordering that keeps family members contiguous: every member
    * sorts at the position of its family's alphabetically-first member,
    * then by name within the family. */
  def benchSortKey(name: String): (String, String) = {
    val anchor = familyOf.get(name)
      .map(f => cacheFamilies(f).min).getOrElse(name)
    (anchor, name)
  }

  /** Unpersist and forget every session-scoped helper cache for `s`,
    * then sweep any remaining cached relations out of the session's
    * CacheManager (catches per-run `.cache()` frames a query built and
    * abandoned — no registered query does this today; the sweep is the
    * backstop for any future offender). Idempotent and
    * cheap when nothing is cached; the next consumer rebuilds lazily.
    *
    * Call between independent units of work that should not share
    * storage budget — Bench and Verify call it at [[cacheFamilies]]
    * boundaries, so a family's measured reps see exactly its own
    * working set and nothing else's. Do NOT call mid-family when reuse
    * is intended (q130→q131 would rebuild their shared edge caches).
    *
    * Scope caveat: the final `catalog.clearCache()` sweep clears the
    * SharedState-level CacheManager, which is CONTEXT-wide — it drops
    * cached relations of every session sharing the SparkContext, not
    * just `s`. Harmless for the single-session Bench/Verify drivers;
    * a future multi-session caller who wants per-session scoping must
    * sweep only the relations planned by `s` instead. */
  def clearCaches(s: SparkSession): Unit = {
    operators.Dedup.SessionCache.clearAll(s)
    operators.Curation.clearEdgeCache(s)
    try s.catalog.clearCache()
    catch { case _: Throwable => () } // session may be stopping
  }
}
