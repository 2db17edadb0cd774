package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drift, TrainingOps}
import graft.operators.EventsOps
import graft.streaming.{ArtifactMonitor, StreamExactSubstr, StreamSemDedup}

/** The trained-artifact staleness contract (VERDICT r15 #4): each of
  * the five train-batch/serve-stream hand-offs has a monitor that
  * compares the frozen artifact against a sliding window. Per kernel,
  * two cases: the flag stays SILENT on a replay of the training
  * distribution, and FIRES on a shifted one.
  */
class ArtifactMonitorSpec extends SparkSpec {

  private val sfDir = TestSession.sfDir

  test("SemDedup codebook: silent on replay, fires on a shifted embedding space") {
    val emb = Tables.embeddings(spark, sfDir)
    val codebook = StreamSemDedup.trainCodebook(emb)
    val ref = ArtifactMonitor.meanCellD2(emb, codebook)
    assert(ref > 0L, "training inertia must be positive")
    val replay = ArtifactMonitor.semCodebookReport(emb, codebook, ref).head
    assert(!replay.getBoolean(4),
      s"replay must not flag: ratio_pm=${replay.getLong(3)}")
    assert(replay.getLong(3) == 1000L, "replay ratio must be exactly 1000 pm")
    val shifted = emb.withColumn("embedding",
      transform(col("embedding"), x => x + lit(5.0f)))
    val rep = ArtifactMonitor.semCodebookReport(shifted, codebook, ref).head
    assert(rep.getBoolean(4),
      s"shifted window must flag: ratio_pm=${rep.getLong(3)}")
  }

  test("Bucket terciles: silent on replay, fires when occupancy collapses") {
    val sc = TrainingOps.lmScores(spark, sfDir)
    val thr = TrainingOps.tercileThresholds(sc)
    val replay = ArtifactMonitor.bucketOccupancyReport(sc, thr).collect()
    assert(replay.nonEmpty)
    replay.foreach { r =>
      assert(!r.getBoolean(6),
        s"${r.getString(0)}: replay occupancy must calibrate, dev_pm=${r.getLong(5)}")
    }
    // a score distribution that fell off a cliff: everything lands tail
    val shifted = sc.withColumn("lm_score",
      col("lm_score") - lit(1000000000000L))
    val rep = ArtifactMonitor.bucketOccupancyReport(shifted, thr).collect()
    rep.foreach { r =>
      assert(r.getBoolean(6),
        s"${r.getString(0)}: collapsed occupancy must flag, dev_pm=${r.getLong(5)}")
    }
  }

  test("CUSUM mu: silent on replay, fires when traffic doubles") {
    val ev = Tables.events(spark, sfDir)
    val mu = EventsOps.cusumMu(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val replay = ArtifactMonitor.cusumMuReport(ev, mu).collect()
    assert(replay.nonEmpty && replay.length == mu.size)
    replay.foreach { r =>
      assert(r.getLong(3) == 0L && !r.getBoolean(4),
        s"${r.getString(0)}: replay mean must match exactly")
    }
    val doubled = ev.unionAll(ev)
    val rep = ArtifactMonitor.cusumMuReport(doubled, mu).collect()
    rep.foreach { r =>
      assert(r.getBoolean(4),
        s"${r.getString(0)}: doubled traffic must flag, dev_pm=${r.getLong(3)}")
    }
  }

  test("Drift reference CDFs: silent on replay, fires on a shifted domain") {
    val docs = Tables.documents(spark, sfDir)
    val ref = Drift.referenceCdfs(docs, "n_chars")
    val replay = ArtifactMonitor
      .driftReferenceReport(docs, ref, "n_chars").collect()
    assert(replay.nonEmpty && replay.length == ref.size)
    replay.foreach { r =>
      assert(r.getLong(2) == 0L && !r.getBoolean(4),
        s"${r.getString(0)}: replay KS must be 0, got ${r.getLong(2)}")
    }
    val shifted = docs.withColumn("n_chars", col("n_chars") + lit(100000L))
    val rep = ArtifactMonitor
      .driftReferenceReport(shifted, ref, "n_chars").collect()
    rep.foreach { r =>
      assert(r.getLong(2) == 1000L && r.getBoolean(4),
        s"${r.getString(0)}: disjoint domain must hit KS=1000, got ${r.getLong(2)}")
    }
  }

  test("ExactSubstr dictionary: silent on replay, fires on novel duplicated passages") {
    val s = spark
    import s.implicits._
    def passage(tag: String): String =
      (0 until 60).map(i => s"$tag$i").mkString(" ")
    // training corpus: passage A duplicated across two docs, plus two
    // all-unique docs
    val train = Seq(
      (1L, passage("a")),
      (2L, "lead in words " + passage("a")),
      (3L, (0 until 80).map(i => s"u$i").mkString(" ")),
      (4L, (0 until 80).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val dict = StreamExactSubstr.trainDupAnchors(train)
    assert(dict.nonEmpty, "passage A must train into the dictionary")
    val replay = ArtifactMonitor.exactSubstrDictReport(train, dict).head
    assert(replay.getLong(1) == 0L && !replay.getBoolean(3),
      s"replay window duplicates nothing novel: ${replay.getLong(1)}")
    // shifted window: the SAME corpus plus a brand-new duplicated
    // passage B the dictionary has never seen
    val window = train.unionAll(Seq(
      (5L, passage("b")),
      (6L, passage("b") + " trailing words here")
    ).toDF("doc_id", "text"))
    val rep = ArtifactMonitor.exactSubstrDictReport(window, dict).head
    assert(rep.getLong(1) > 0L && rep.getBoolean(3),
      s"novel passage B must flag: novel=${rep.getLong(1)} pm=${rep.getLong(2)}")
  }
}
