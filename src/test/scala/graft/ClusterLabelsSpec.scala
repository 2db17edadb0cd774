package graft

import graft.operators.Curation
import org.apache.spark.sql.functions.col

/** Connected-component labeling (Curation.clusterLabels) checked at two
  * graph sizes against exhaustively-known components, plus the
  * edge-count-derived shuffle sizing (graphPartsFor).
  */
class ClusterLabelsSpec extends SparkSpec {
  import spark.implicits._

  private def labelMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Curation.clusterLabels(pairs.toDF("doc_a", "doc_b"))
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("small graph: two components, each labeled by its min node") {
    // component {1,2,3} (path) and {10,11} — min labels 1 and 10
    val got = labelMap(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("larger graph: long chain + star + ring converge to min labels") {
    // chain 0-1-...-19 (diameter 19 stresses the round loop), star
    // centered at 100 with leaves 101..110, ring 200..209
    val chain = (0L until 19L).map(i => (i, i + 1))
    val star = (101L to 110L).map(i => (100L, i))
    val ring = (200L until 209L).map(i => (i, i + 1)) :+ (209L, 200L)
    val got = labelMap(chain ++ star ++ ring)
    assert(got.size == 20 + 11 + 10)
    (0L to 19L).foreach(i => assert(got(i) == 0L, s"chain node $i"))
    (100L to 110L).foreach(i => assert(got(i) == 100L, s"star node $i"))
    (200L to 209L).foreach(i => assert(got(i) == 200L, s"ring node $i"))
  }

  test("graphPartsFor scales with edges: floor 1, linear middle, cap 2048") {
    assert(Curation.graphPartsFor(0L) == 1)
    assert(Curation.graphPartsFor(1L) == 1)
    assert(Curation.graphPartsFor(1L << 20) == 1)
    assert(Curation.graphPartsFor((1L << 20) + 1) == 2)
    assert(Curation.graphPartsFor(100L << 20) == 100)
    assert(Curation.graphPartsFor(Long.MaxValue / 4) == 2048)
  }

  test("q197: no verified near-dup pair straddles splits; corpus conserved") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    def byName(n: String) = SparkEntry.all.find(_.name == n).get
    val rows = byName("q197_leakage_free_split").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum == nDocs, "split must conserve the corpus")
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    // the gate splits roughly 80/10/10 (hash noise, not exactness)
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > nDocs * 6 / 10, s"train too small: $bySplit")
    // THE invariant, checked through the actual pair list: every verified
    // near-dup pair (q29's output) must land whole in one split, where a
    // doc's split derives from ITS cluster exactly as the query computes
    val lab = Curation.dupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def splitOf(doc: Long) =
      ((37L * lab.getOrElse(doc, doc) + 11L) % 2147483647L) % 10 match {
        case g if g < 8 => "train"
        case 8 => "val"
        case _ => "test"
      }
    val pairs = byName("q29_neardup_jaccard").run(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no verified near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles splits")
    }
    assert(rows.map(_._4).sum == lab.size, "n_from_clusters must count graph docs")
  }
}
