package graft

import org.apache.spark.sql.types._

/** Name+TYPE contract between every registered query and its DuckDB
  * oracle. The driver's comparator sorts columns by name and compares
  * value matrices via pandas repr — so a renamed alias OR a type drift
  * that changes repr (the HUGEINT→float64 trap, a decimal scale change,
  * float32 vs float64 rounding) only surfaces at driver time as an
  * opaque hash mismatch. This spec moves that check into the suite:
  * tools/oracle_schema.py describes each oracle's result relation in
  * DuckDB (no rows fetched) and the Spark side comes from plan analysis
  * only, so the whole 202-pair sweep costs two schema passes.
  *
  * Types compare by repr-equivalence class, the invariant the driver
  * actually needs: integer widths are one class (int32 and int64 repr
  * identically in pandas), VARCHAR and JSON both land as str, all
  * timestamp flavors land as datetime64. HUGEINT has no class — it
  * floats to float64 and corrupts reprs (SKILL.md gotcha), so its
  * appearance is always a failure.
  */
class OracleSchemaSpec extends SparkSpec {

  private val sfDir = TestSession.sfDir

  /** DuckDB type string → repr-equivalence class, None = no class
    * (always a mismatch, e.g. HUGEINT). */
  private def duckClass(t: String): Option[String] = {
    val up = t.toUpperCase.trim
    if (up.endsWith("[]")) return duckClass(up.dropRight(2)).map("ARRAY<" + _ + ">")
    up match {
      case "TINYINT" | "SMALLINT" | "INTEGER" | "BIGINT" => Some("INT")
      case "HUGEINT" | "UHUGEINT" => None
      case "VARCHAR" | "JSON" => Some("STR")
      case "DOUBLE" => Some("F64")
      case "FLOAT" | "REAL" => Some("F32")
      case "BOOLEAN" => Some("BOOL")
      case "DATE" => Some("DATE")
      case ts if ts.startsWith("TIMESTAMP") => Some("TS")
      case dec if dec.startsWith("DECIMAL") =>
        // repr of a python Decimal carries the SCALE ('1.20' vs '1.2'),
        // so the class pins scale; precision doesn't print
        Some("DEC_s" + dec.stripSuffix(")").split(",").last.trim)
      case _ => None
    }
  }

  private def sparkClass(t: DataType): Option[String] = t match {
    case ByteType | ShortType | IntegerType | LongType => Some("INT")
    case StringType => Some("STR")
    case DoubleType => Some("F64")
    case FloatType => Some("F32")
    case BooleanType => Some("BOOL")
    case DateType => Some("DATE")
    case TimestampType | TimestampNTZType => Some("TS")
    case d: DecimalType => Some("DEC_s" + d.scale)
    case ArrayType(e, _) => sparkClass(e).map("ARRAY<" + _ + ">")
    case _ => None
  }

  test("every oracle's DuckDB result schema matches the Spark schema (name + type class)") {
    // same escaping Verify uses for oracle_sql.json
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }.mkString("{", ",", "}")
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, json)
    val proc = new ProcessBuilder(
      "python3", "tools/oracle_schema.py", tmp.toString, sfDir)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
    assert(proc.waitFor() == 0, s"oracle_schema.py failed:\n${out.takeRight(2000)}")
    val duck: Map[String, Seq[(String, String)]] = out.linesIterator
      .filter(_.contains('\t')).toSeq
      .map { l => val Array(n, c, t) = l.split('\t'); (n, c, t) }
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap

    assert(duck.keySet == SparkEntry.oracleSql.keySet,
      "oracle_schema.py did not describe every oracle")

    val offenders = SparkEntry.all.flatMap { d =>
      val sparkCols = d.run(spark, sfDir).schema.fields
        .map(f => f.name -> f.dataType).sortBy(_._1)
      val duckCols = duck(d.name).sortBy(_._1)
      if (sparkCols.map(_._1).toSeq != duckCols.map(_._1).toSeq)
        Some(s"${d.name}: columns ${sparkCols.map(_._1).mkString(",")} " +
          s"!= ${duckCols.map(_._1).mkString(",")}")
      else {
        val bad = sparkCols.zip(duckCols).collect {
          case ((n, st), (_, dt))
              if sparkClass(st).isEmpty || sparkClass(st) != duckClass(dt) =>
            s"$n: spark=$st duck=$dt"
        }
        if (bad.nonEmpty) Some(s"${d.name}: ${bad.mkString("; ")}") else None
      }
    }
    assert(offenders.isEmpty,
      s"oracle/Spark schema drift:\n${offenders.mkString("\n")}")
  }
}
