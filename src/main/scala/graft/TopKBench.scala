package graft

import org.apache.spark.sql.functions._

/** A/B evidence for the BoundedTopK claim: per-group top-k via the
  * k-bounded aggregator vs the window-rank formulation, on a synthetic
  * skewed input (few groups × many rows — the regime where window-rank
  * must sort entire hot groups and the aggregator ships k rows per
  * group per task). Usage: TopKBench [rows] [groups]; prints one line
  * per variant. Results recorded in SCALE.md.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 100_000_000L
    val groups = if (args.length > 1) args(1).toInt else 16
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", "topk-bench")
    import org.apache.spark.sql.expressions.Window

    // deterministic skewed fact: group ~ id % groups, score ~ xorshift
    val fact = spark.range(rows)
      .select((col("id") % groups).as("g"),
        pmod(hash(col("id")), lit(1_000_000)).cast("long").as("score"),
        col("id").as("k"))

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("k"))
    time("window_rank") {
      fact.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }

    val topk = udaf(new operators.BoundedTopK(3),
      org.apache.spark.sql.Encoders.product[operators.Scored])
    time("bounded_agg") {
      fact.groupBy(col("g")).agg(topk(col("score"), col("k")).as("tk"))
        .select(col("g"), posexplode(col("tk.xs")))
    }
    spark.stop()
  }
}
