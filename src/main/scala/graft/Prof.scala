package graft

/** Per-query timing main: runs each named query (default: all) twice —
  * cold (codegen + scan warm-up included) and warm — so plan-level cost
  * can be separated from one-time JIT/codegen overhead when optimizing.
  * Usage: Prof <sfDir> [name ...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSet
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", "graft-prof")
    SparkEntry.all
      .filter(d => names.isEmpty || names.contains(d.name))
      .foreach { d =>
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          // noop sink, not count(): count() lets ColumnPruning drop the
          // projections under test, so projection-only queries would
          // time nothing but the scan
          d.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"${d.name} rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
    spark.stop()
  }
}
