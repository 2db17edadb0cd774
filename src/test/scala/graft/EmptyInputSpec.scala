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

  test("q177 emits the zero-filled 4-row depth spine on empty input") {
    // Matches the DuckDB oracle's explicit depth spine: global-agg sums
    // must coalesce to 0, not propagate the all-NULL aggregate row.
    val rows = SparkEntry.all.find(_.name == "q177_funnel_dropoff").get
      .run(spark, emptyDir).orderBy("depth").collect()
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getLong(0) == k.toLong, s"depth at row $k")
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L, s"n_at/n_reached at depth $k")
      assert(r.getLong(3) == (if (k == 0) 1000L else 0L), s"conversion at depth $k")
    }
  }

  test("q200 keeps a source whose docs are all shorter than 8 tokens") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-shortsrc").toString
    Tables.names.foreach { n =>
      val src =
        if (n == "events")
          Tables.events(spark, "/root/testdata/sf0.001")
            .withColumn("ts", expr("unix_micros(ts) * 1000"))
        else Tables(spark, "/root/testdata/sf0.001", n)
      val out =
        if (n == "documents")
          // Two sources: one normal, one whose every doc has < 8 tokens
          // (no shingles) — the left join must still emit its datasheet row.
          spark.range(6).select(
            col("id").as("doc_id"),
            when(col("id") < 3, concat_ws(" ", (0 to 19).map(i => lit(s"w$i")): _*))
              .otherwise(lit("tiny doc only")).as("text"),
            lit("en").as("lang"),
            when(col("id") < 3, "long_src").otherwise("short_src").as("source"),
            lit(20L).as("n_chars"))
        else src.limit(0)
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val ds = SparkEntry.all.find(_.name == "q200_source_datasheet").get
      .run(spark, dir).collect()
    val bySrc = ds.map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    assert(bySrc.contains("short_src"), "shingle-free source missing from datasheet")
    assert(bySrc("short_src").isNullAt(ds.head.fieldIndex("novel_permille")),
      "novel_permille should be NULL when the source has no shingles")
    assert(bySrc.contains("long_src"))
    assert(!bySrc("long_src").isNullAt(ds.head.fieldIndex("novel_permille")))
  }
}
