package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a testdata dir: replicate every FACT table
  * `factor`× with disjoint key spaces, so /tmp/sf1 behaves like the
  * driver's generator one notch up without touching the read-only
  * testdata. Used by the SCALE.md §8 memory-pressure A/B.
  *
  * Replica semantics (replica 0 is the identity copy):
  *  - every PK/FK shifts by a round offset per replica, so joins stay
  *    key-consistent and replicas are disjoint (orders ⋈ lineitem,
  *    customer ⋈ orders, part/supplier ⋈ lineitem all land within
  *    replica);
  *  - nation/region stay single-copy (TPC-H dims don't scale with sf;
  *    customer/supplier/part do);
  *  - document TEXT is word-salted per replica (`w` → `w~i`): dedup
  *    structure inside each replica is preserved exactly, while NO
  *    shingle matches across replicas — without this, 10 verbatim
  *    copies of the corpus turn every doc into a 10-way near-dup and
  *    the LSH candidate space explodes ×100, which is a different
  *    workload, not a bigger one;
  *  - embeddings shift each component by rep·1e-3, so no cross-replica
  *    exact ties distort top-k;
  *  - event timestamps keep their window (10× the traffic in the same
  *    hours — more rows per group, the realistic growth direction for
  *    windowed aggregates).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  val KO = 10000000L // order/event id space per replica
  val KK = 1000000L  // cust/supp/part/user/doc/vec id space per replica

  def main(args: Array[String]): Unit = {
    val Array(src, dst, fStr) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, fStr.toInt)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {

    def reps = broadcast(
      spark.range(factor).select(col("id").cast("long").as("rep")))
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // FILE LAYOUT IS A PARALLELISM KNOB (round-15 lesson): the replica
    // tables used to write as ONE compact snappy file each, and a
    // ≤128 MB file is ONE input split — so at sf3 every scan-bound
    // first stage (hashing, tokenizing, sketching) ran serially and
    // the whole-suite sweep measured the layout, not the plans (q43
    // read 62 s; the first q289 measure read 29 s at ×10). A real ×30
    // corpus arrives as many files; the replica now does too.
    def wr(df: DataFrame, t: String, parts: Int =
        spark.sparkContext.defaultParallelism): Unit = {
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      System.err.println(s"[scaleup] wrote $t ($parts files)")
    }
    // The SOURCE side of the crossJoin needs the same treatment as the
    // output (round-16): a single-file source table is ONE input split,
    // so at factor 100 the ×100 row explosion ran inside one task —
    // lineitem ×100 serialized on a single core. Pre-splitting the
    // source spreads the explosion across the executor pool; the
    // post-explosion repartition in wr() then runs with parallel map
    // sides too.
    def pre(t: String): DataFrame =
      rd(t).repartition(spark.sparkContext.defaultParallelism)
    def shifted(t: String)(cols: org.apache.spark.sql.Column*): Unit =
      wr(pre(t).crossJoin(reps).select(cols: _*), t)

    // dims: single copy, single file (25 rows don't need splits)
    wr(rd("region"), "region", parts = 1)
    wr(rd("nation"), "nation", parts = 1)

    shifted("customer")(
      (col("c_custkey") + col("rep") * KK).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    shifted("supplier")(
      (col("s_suppkey") + col("rep") * KK).as("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal"))
    shifted("part")(
      (col("p_partkey") + col("rep") * KK).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice"))
    shifted("orders")(
      (col("o_orderkey") + col("rep") * KO).as("o_orderkey"),
      (col("o_custkey") + col("rep") * KK).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))
    shifted("lineitem")(
      (col("l_orderkey") + col("rep") * KO).as("l_orderkey"),
      (col("l_partkey") + col("rep") * KK).as("l_partkey"),
      (col("l_suppkey") + col("rep") * KK).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate"))
    shifted("events")(
      (col("event_id") + col("rep") * KO).as("event_id"),
      col("ts"),
      (col("user_id") + col("rep") * KK).as("user_id"),
      col("event_type"), col("value"), col("props"))
    wr(pre("documents").crossJoin(reps).select(
      (col("doc_id") + col("rep") * KK).as("doc_id"),
      when(col("rep") === 0, col("text")).otherwise(
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1~"), col("rep").cast("string")))).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")
    wr(pre("embeddings").crossJoin(reps).select(
      (col("vec_id") + col("rep") * KK).as("vec_id"),
      transform(col("embedding"),
        x => x + col("rep").cast("float") * lit(0.001f)).as("embedding"),
      col("label")),
      "embeddings")
  }
}
