package graft

import java.nio.file.Files

/** Robustness sweep: every registered query must execute (possibly to an
  * empty result) against schema-identical EMPTY tables. At 100 TB,
  * "empty" happens constantly — a pruned partition set, a filter that
  * matches nothing, a cold-start stream — and head/min/first on empty
  * input is where naive operators throw.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    // events must keep the RAW file layout (ts = int64 nanos) because the
    // loader re-applies the nanos->micros rebuild on read
    Tables.names.foreach { n =>
      val src =
        if (n == "events")
          Tables.events(spark, "/root/testdata/sf0.001")
            .withColumn("ts", org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000"))
        else Tables(spark, "/root/testdata/sf0.001", n)
      src.limit(0).write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  test("all registered queries run on empty tables") {
    val failures = SparkEntry.all.flatMap { d =>
      try { d.run(spark, emptyDir).count(); None }
      catch { case e: Throwable => Some(s"${d.name}: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
