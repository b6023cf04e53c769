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

  test("query names are unique across groups") {
    // Map construction silently drops dup keys; guard via size accounting
    val names = Seq(queries.CoreQueries, queries.RelationalQueries,
      queries.AggregateQueries).flatMap(_.queries.keys)
    assert(names.distinct.size == names.size)
  }
}
