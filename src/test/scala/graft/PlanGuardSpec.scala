package graft

/** Physical-plan regression guard over EVERY registered query: the
  * plans that pass correctness today must also keep their scale shape
  * tomorrow. A CartesianProductExec (unbounded pair space, both sides
  * big) is never acceptable — the bounded pair-space alternatives are
  * BroadcastNestedLoopJoin over a provably-small broadcast side (q79's
  * 8 centroids, q51's bracket table) or an equi-join. This guard is
  * what turns that design rule into a test.
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.all.flatMap { d =>
      val plan = d.run(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(d.name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("every oracle-paired query declares matching column names in its SQL") {
    // cheap drift guard: each Spark output column name must appear as a
    // token in the oracle SQL (aliased the same way) — the driver's
    // comparator sorts columns by name, so a rename on one side only
    // fails the whole query at the gate instead of here.
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    val offenders = SparkEntry.all.flatMap { d =>
      d.oracle.toSeq.flatMap { sql =>
        val sqlIdents = ident.findAllIn(sql.toLowerCase).toSet
        val cols = d.run(spark, sfDir).schema.fieldNames
        val missing = cols.filterNot(c => sqlIdents.contains(c.toLowerCase))
        if (missing.nonEmpty) Some(s"${d.name}: ${missing.mkString(",")}") else None
      }
    }
    assert(offenders.isEmpty, s"column names absent from oracle SQL: $offenders")
  }
}
