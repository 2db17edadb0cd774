package graft

/** Storage hygiene across repeated executions — the mechanical closure
  * of the r13 bench-churn class (VERDICT r13 #1): re-running a query
  * must add NOTHING to the storage pool once its staged checkpoints are
  * released. Covered queries are every per-execution stagedCheckpoint
  * consumer (direct sites plus the DistributedRank helpers) and the two
  * r13 churn victims; if a future query re-introduces an unreleased
  * per-execution persist/checkpoint, its second run grows the cached-RDD
  * set and this spec turns red with the query's name.
  */
class StorageHygieneSpec extends SparkSpec {

  private val dir = TestSession.sfDir

  private def cachedIds: Set[Int] =
    spark.sparkContext.getRDDStorageInfo
      .filter(_.numCachedPartitions > 0).map(_.id).toSet

  // every direct stagedCheckpoint consumer, one DistributedRank consumer
  // per host file, and the r13 churn victims (q63/q145)
  private val covered = Seq(
    "q51_broadcast_range_join", "q57_gapfill", "q63_curation_pipeline",
    "q82_vocab_coverage", "q135_bigram_lm_score", "q145_containment",
    "q161_power_iteration", "q203_importance_resampling",
    "q209_kcenter_coreset", "q221_top_ngrams", "q224_phrase_search",
    "q232_clustering_eval", "q234_keyness", "q237_qgram_spectrum",
    "q246_quality_classifier")

  test("a second execution adds no storage once staged checkpoints release") {
    val byName = SparkEntry.all.map(d => d.name -> d).toMap
    val missing = covered.filterNot(byName.contains)
    assert(missing.isEmpty, s"stale coverage list: $missing")
    val leaks = covered.flatMap { n =>
      val d = byName(n)
      Graft.clearCaches(spark)
      def once(): Unit = {
        d.run(spark, dir).write.format("noop").mode("overwrite").save()
        Graft.releaseStagedCheckpoints(spark)
      }
      once() // stages the query's family caches (allowed to persist)
      val base = cachedIds
      once() // must reuse, never grow
      val extra = cachedIds -- base
      if (extra.nonEmpty) Some(n -> extra.size) else None
    }
    assert(leaks.isEmpty,
      s"queries leaked cached RDDs across executions: $leaks")
    Graft.clearCaches(spark)
  }
}
