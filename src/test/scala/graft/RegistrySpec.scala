package graft

class RegistrySpec extends SparkSpec {

  test("registry: unique names, every oracle key backed by a query") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // docs exist for every operator
    assert(SparkEntry.all.forall(_.doc.nonEmpty))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
