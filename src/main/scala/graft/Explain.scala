package graft

/** Plan-inspection main: prints explain("formatted") for the named
  * queries (or all) against a scale dir. Used to keep plans honest:
  * PushedFilters reaching the scan, broadcasts where dims are small,
  * no stray shuffles. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSet
    val spark = GraftSession.create("local[4]", "graft-explain")
    SparkEntry.all
      .filter(d => names.isEmpty || names.contains(d.name))
      .foreach { d =>
        println(s"\n========== ${d.name} ==========")
        d.run(spark, sfDir).explain("formatted")
      }
    spark.stop()
  }
}
