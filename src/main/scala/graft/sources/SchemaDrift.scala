package graft.sources

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema inference + drift report — the crawler tier of the reference
  * (glue_cf_template.json:90-93 configures a crawler with
  * SchemaChangePolicy UpdateBehavior: LOG: on drift, report, don't
  * rewrite the contract). This is what a real user hits on the first
  * drifted file: a producer adds a column, retypes one, or drops one,
  * and the pipeline must SEE it before the job consumes garbage.
  *
  * Spark-first shape: inference IS a scan (spark.read.json/csv with
  * inferSchema walks the files distributed, merging per-partition
  * schemas), so it scales with the drop like any other read. The diff
  * itself is pure metadata — two StructTypes on the driver — and the
  * report frame is a handful of rows; nothing here belongs in an
  * executor beyond the inference scan.
  *
  * Nested fields are compared by dotted path (a.b.c), so a retype three
  * levels down in a struct reports as `a.b.c retyped`, not as an opaque
  * top-level struct change. Array/map element types compare as part of
  * the rendered type string.
  */
object SchemaDrift {

  /** One drift finding. declaredType/observedType are simpleString
    * renderings; None = absent on that side. */
  final case class Drift(
      column: String,
      declaredType: Option[String],
      observedType: Option[String],
      change: String)

  /** Infer the schema of a landed JSON-lines drop (a distributed scan;
    * Spark merges per-file schemas). */
  def inferJson(s: SparkSession, path: String): StructType =
    s.read.json(path).schema

  /** Infer the schema of a landed CSV drop (header row + type
    * inference pass). */
  def inferCsv(s: SparkSession, path: String): StructType =
    s.read.option("header", "true").option("inferSchema", "true").csv(path).schema

  /** Flatten a schema to (dotted path -> rendered type). Struct fields
    * recurse; arrays/maps render whole (their element type changes show
    * as a retype of the holding column, which is how a consumer
    * experiences them). */
  private def flatten(t: StructType, prefix: String = ""): Seq[(String, String)] =
    t.fields.toSeq.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => flatten(st, path)
        case dt => Seq(path -> dt.simpleString)
      }
    }

  /** Pure diff of declared vs observed schema: one Drift per dotted
    * path that is added / removed / retyped, plus unchanged rows so the
    * report is a complete contract statement (a consumer can diff two
    * reports, not just two alerts). */
  def diff(declared: StructType, observed: StructType): Seq[Drift] = {
    val d = flatten(declared).toMap
    val o = flatten(observed).toMap
    (d.keySet ++ o.keySet).toSeq.sorted.map { path =>
      (d.get(path), o.get(path)) match {
        case (None, Some(ot))               => Drift(path, None, Some(ot), "added")
        case (Some(dt), None)               => Drift(path, Some(dt), None, "removed")
        case (Some(dt), Some(ot)) if dt != ot => Drift(path, Some(dt), Some(ot), "retyped")
        case (dt, ot)                       => Drift(path, dt, ot, "unchanged")
      }
    }
  }

  /** The drift report as a DataFrame (the operator's public output —
    * lands in the curated zone next to the data it describes). */
  def report(s: SparkSession, declared: StructType, observed: StructType): DataFrame = {
    import s.implicits._
    diff(declared, observed)
      .map(r => (r.column, r.declaredType.orNull, r.observedType.orNull, r.change))
      .toDF("col_name", "declared_type", "observed_type", "change")
  }

  // ------------------------------------------------------------------
  // Drifted fixture for the driver gate: the events table re-landed as
  // a JSON drop by a producer that (a) retyped user_id to string,
  // (b) dropped props, (c) added client_ip — diffed against the
  // declared contract. Only TYPES matter to the report, so the drop is
  // a small prefix of rows; the report itself is row-count-independent.
  // ------------------------------------------------------------------

  private val declaredEvents = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def landDriftedDrop(s: SparkSession, dir: String): String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_drift_drop").toString
    Tables.events(s, dir).limit(200)
      .select(
        col("event_id"),
        graft.functions.Fns.epochUs(col("ts")).as("ts"),
        col("user_id").cast("string").as("user_id"), // retyped
        col("event_type"),
        col("value"),
        concat(lit("10.0.0."), col("user_id") % 256).as("client_ip")) // added
      .coalesce(1)
      .write.mode("overwrite").json(out)
    out
  }

  val defs: Seq[QueryDef] = Seq(
    q("q75_schema_drift",
      """Schema drift report over a drifted JSON drop (crawler
        |UpdateBehavior LOG analog): the events contract vs a landed
        |drop where user_id was retyped to string, props dropped and
        |client_ip added. The Spark side actually lands the drop and
        |runs distributed inference over it; the oracle pins the exact
        |expected report (the drift is deterministic metadata, so the
        |expected rows are closed-form).""".stripMargin,
      """SELECT * FROM (VALUES
        |  ('client_ip',  CAST(NULL AS VARCHAR), 'string', 'added'),
        |  ('event_id',   'bigint', 'bigint', 'unchanged'),
        |  ('event_type', 'string', 'string', 'unchanged'),
        |  ('props',      'string', CAST(NULL AS VARCHAR), 'removed'),
        |  ('ts',         'bigint', 'bigint', 'unchanged'),
        |  ('user_id',    'bigint', 'string', 'retyped'),
        |  ('value',      'double', 'double', 'unchanged')
        |) AS t(col_name, declared_type, observed_type, change)""".stripMargin) { (s, dir) =>
      val drop = landDriftedDrop(s, dir)
      report(s, declaredEvents, inferJson(s, drop))
    })
}
