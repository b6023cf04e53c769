package graft

class QueriesSpec extends SparkSpecBase {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query and oracle names are unique across ALL groups") {
    // Map construction silently drops dup keys; guard via size accounting
    // over the REAL group list (a new group with a colliding name would
    // otherwise shadow an existing query without any failure)
    val qNames = SparkEntry.groups.flatMap(_.queries.keys)
    assert(qNames.distinct.size == qNames.size,
      qNames.groupBy(identity).filter(_._2.size > 1).keys.toString)
    val oNames = SparkEntry.groups.flatMap(_.oracles.keys)
    assert(oNames.distinct.size == oNames.size,
      oNames.groupBy(identity).filter(_._2.size > 1).keys.toString)
  }
}
