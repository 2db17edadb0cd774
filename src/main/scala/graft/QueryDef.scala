package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract: a Spark
  * implementation plus (when SQL-expressible) an equivalent DuckDB oracle
  * over the same parquet tables. Column names/aliases MUST match between
  * the two — the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def q(name: String, doc: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, doc, run, Some(oracle))
}
