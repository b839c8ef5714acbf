package graft

/** Driver-contract smoke: entry rows > 0, every oracle key has a query,
  * every query runs non-empty-schema at sf0.001. */
class SparkEntrySpec extends SparkSpecBase {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("headlines are oracle-backed") {
    assert(SparkEntry.headlines.nonEmpty)
    assert(SparkEntry.headlines.forall(_.oracle.nonEmpty))
  }

  test("query names are unique") {
    assert(SparkEntry.catalog.map(_.name).distinct.size === SparkEntry.catalog.size)
  }
}
