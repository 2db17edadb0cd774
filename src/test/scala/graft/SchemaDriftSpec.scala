package graft

import graft.sources.SchemaDrift
import graft.sources.SchemaDrift.Drift
import org.apache.spark.sql.types._

/** Schema inference + drift diff (the crawler-LOG analog): pure diff
  * semantics incl. nested paths, and real inference over landed JSON
  * and CSV drops.
  */
class SchemaDriftSpec extends SparkSpec {

  private val declared = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType)))),
    StructField("tags", ArrayType(StringType))))

  test("diff: added, removed, retyped, unchanged — nested fields by dotted path") {
    val observed = StructType(Seq(
      StructField("id", LongType),                    // unchanged
      StructField("name", LongType),                  // retyped
      StructField("meta", StructType(Seq(
        StructField("mime", StringType),              // unchanged (nested)
        StructField("n_bytes", StringType),           // retyped (nested)
        StructField("source", StringType)))),         // added (nested)
      // tags removed
      StructField("extra", DoubleType)))              // added
    val got = SchemaDrift.diff(declared, observed)
    assert(got == Seq(
      Drift("extra", None, Some("double"), "added"),
      Drift("id", Some("bigint"), Some("bigint"), "unchanged"),
      Drift("meta.mime", Some("string"), Some("string"), "unchanged"),
      Drift("meta.n_bytes", Some("bigint"), Some("string"), "retyped"),
      Drift("meta.source", None, Some("string"), "added"),
      Drift("name", Some("string"), Some("bigint"), "retyped"),
      Drift("tags", Some("array<string>"), None, "removed")))
  }

  test("identical schemas produce an all-unchanged report") {
    assert(SchemaDrift.diff(declared, declared).forall(_.change == "unchanged"))
  }

  test("JSON drop: inference sees the drift a producer introduced") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift_json").toString
    Seq(("""{"id": 1, "name": "a", "added_col": true}"""))
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val decl = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("gone", StringType)))
    val changes = SchemaDrift.diff(decl, SchemaDrift.inferJson(spark, dir))
      .map(d => d.column -> d.change).toMap
    assert(changes == Map(
      "added_col" -> "added", "gone" -> "removed",
      "id" -> "unchanged", "name" -> "unchanged"))
  }

  test("CSV drop: header + type inference feed the same diff") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift_csv").toString
    Seq("id,name", "7,x", "8,y").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val decl = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType)))
    val changes = SchemaDrift.diff(decl, SchemaDrift.inferCsv(spark, dir))
      .map(d => d.column -> d.change).toMap
    // CSV inference types the numeric column — the classic silent
    // retype a LOG-policy crawler must surface
    assert(changes == Map("id" -> "retyped", "name" -> "unchanged"))
  }

  test("report frame carries the exact (col, declared, observed, change) rows") {
    val observed = StructType(Seq(StructField("id", StringType)))
    val decl = StructType(Seq(StructField("id", LongType)))
    val rows = SchemaDrift.report(spark, decl, observed).collect()
    assert(rows.length == 1)
    assert(rows.head.toSeq == Seq("id", "bigint", "string", "retyped"))
  }
}
