package graft

import org.apache.spark.sql.functions._

/** Replica invariants of the §8 scale-up instrument: if ScaleUp's
  * output doesn't behave like "the same generator, bigger", the sf1
  * A/B measures a different workload, not a bigger one. */
class ScaleUpSpec extends SparkSpec {

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("scaleup").toString
    ScaleUp.run(spark, TestSession.sfDir, d, 3)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")
  private def src(name: String) =
    spark.read.parquet(s"${TestSession.sfDir}/$name.parquet")

  test("fact tables replicate x factor; dims stay single-copy") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() == 3 * src(n).count(), s"$n row count")
    for (n <- Seq("region", "nation"))
      assert(t(n).count() == src(n).count(), s"$n must not replicate")
  }

  test("key spaces are disjoint across replicas and joins stay key-consistent") {
    assert(t("orders").select(col("o_orderkey")).distinct().count() ==
      3 * src("orders").select(col("o_orderkey")).distinct().count())
    // every lineitem FK resolves: the join count must replicate exactly —
    // a shifted-on-one-side-only key would orphan rows instead
    val joined = t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey")).count()
    val base = src("lineitem").join(src("orders"), col("l_orderkey") === col("o_orderkey")).count()
    assert(joined == 3 * base, "lineitem ⋈ orders must replicate exactly")
  }

  test("document text is dup-preserving within replicas, disjoint across them") {
    // within-replica dup structure preserved: distinct texts triple
    // (each replica contributes its own salted distinct set)
    assert(t("documents").select(col("text")).distinct().count() ==
      3 * src("documents").select(col("text")).distinct().count())
    // and no shingle bridges replicas: every word carries its replica
    // salt, so a 3-gram from replica 1 never equals one from replica 2
    // (same word-3-gram construction as Dedup.shinglesOf)
    val shingles = t("documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("i", explode(when(size(col("w")) >= 3,
        sequence(lit(1), size(col("w")) - 2)).otherwise(array())))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("sh"))
    val cross = shingles
      .withColumn("rep", (col("doc_id") / ScaleUp.KK).cast("long"))
      .groupBy(col("sh")).agg(countDistinct(col("rep")).as("nrep"))
      .filter(col("nrep") > 1).count()
    assert(cross == 0, "a shingle crossed replicas — candidate space would explode")
  }

  test("embeddings perturb per replica: no cross-replica exact vector ties") {
    val ties = t("embeddings")
      .withColumn("rep", (col("vec_id") / ScaleUp.KK).cast("long"))
      .groupBy(col("embedding")).agg(countDistinct(col("rep")).as("nrep"))
      .filter(col("nrep") > 1).count()
    assert(ties == 0, "identical vectors across replicas would tie exact top-k")
  }
}
