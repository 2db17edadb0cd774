package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver's parquet tables, paired (when
  * SQL-expressible) with a DuckDB oracle in [[oracleSql]]. The
  * implementations live in graft.operators.*.
  */
object SparkEntry {

  /** All registered operator queries, in presentation order. */
  val all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.AdvancedOps.defs ++
      operators.ExtendedOps.defs ++
      operators.ArrayOps.defs ++
      operators.TpchOps.defs ++
      operators.EventsOps.defs ++
      operators.TextOps.defs ++
      operators.Dedup.defs ++
      operators.Curation.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs ++
      operators.ScaleOps.defs ++
      operators.TrainingOps.defs ++
      operators.TemporalJoins.defs ++
      operators.DataQuality.defs ++
      operators.Drift.defs ++
      operators.TimeSeries.defs ++
      operators.Attribution.defs ++
      operators.MlEval.defs ++
      sources.SchemaDrift.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
