package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle type discipline (r10 judge finding, VERDICT.md "What's wrong" #1).
  *
  * DuckDB types an uncast integer SUM as HUGEINT (int128). HUGEINT has no
  * int64 / Arrow mapping, so a type-sensitive driver hasher mismatches a
  * HUGEINT oracle column against Spark's BIGINT parquet on EVERY row while
  * a names-only schema compare and a Python fetchall value compare both
  * stay green — exactly the `rows/schema true, hash false` signature
  * `oov_rate` showed for two consecutive driver rounds. The fix class is
  * `CAST(SUM(...) AS BIGINT)`; this spec kills the bug class by running
  * every oracle in the battery against the sf0.001 fixtures through the
  * vendored DuckDB JDBC driver and asserting no result column types
  * HUGEINT (tools/preflight.py enforces the same gate driver-side).
  */
class OracleTypeSpec extends AnyFunSuite {

  test("no oracle result column types HUGEINT in DuckDB") {
      graft.sources.DuckGate.withDuck {
    val sfDir = "/root/testdata/sf0.001"
    val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
    try {
      val st = con.createStatement()
      graft.Tables.names.foreach { t =>
        val p = new java.io.File(s"$sfDir/$t.parquet")
        val src =
          if (p.isDirectory) s"${p.getAbsolutePath}/*.parquet"
          else p.getAbsolutePath
        if (p.exists()) st.execute(
          s"CREATE VIEW $t AS SELECT * FROM read_parquet('$src')")
      }
      val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
        case (name, sql) =>
          val rs = st.executeQuery(sql)
          try {
            val md = rs.getMetaData
            (1 to md.getColumnCount).collect {
              case i if md.getColumnTypeName(i).toUpperCase
                  .contains("HUGEINT") =>
                s"$name.${md.getColumnName(i)}"
            }
          } finally rs.close()
      }
      assert(offenders.isEmpty,
        s"HUGEINT-typed oracle columns (CAST to BIGINT): " +
          offenders.mkString(", "))
    } finally con.close()
      }
  }
}
