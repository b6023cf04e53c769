package graft.sources

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** Catalyst dialect for the DuckDB JDBC driver (`jdbc:duckdb:`) — the
  * reference ecosystem's declared store is a single-file `.duckdb`
  * database (reference pipelines/sample_step.yml:10 `duckdb_path`), and
  * Spark needs one dialect hook to write into it: 4.1's
  * `JdbcUtils.tableExists` only maps the probe-query failure to "table
  * absent" when the dialect classifies it as an object-not-found
  * `SQLException` — anything else rethrows. DuckDB reports a missing
  * table as "Catalog Error: Table ... does not exist!" with no vendor
  * SQLState the base dialect recognizes, so without the override every
  * first write to a fresh file dies in the existence probe. DuckDB's
  * actual syntax failures are prefixed "Parser Error", never "Catalog
  * Error", so classifying on the message prefix is unambiguous.
  *
  * Everything else (double-quoted identifiers, ANSI type names TEXT /
  * BIGINT / DOUBLE PRECISION, `SELECT 1 FROM t LIMIT 1` probes) already
  * matches DuckDB's SQL surface, so the base-dialect defaults stand.
  */
object DuckDbDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:duckdb:")

  override def isObjectNotFoundException(e: SQLException): Boolean =
    e.getMessage != null && e.getMessage.contains("Catalog Error")

  override def isSyntaxErrorBestEffort(e: SQLException): Boolean =
    e.getMessage != null && e.getMessage.contains("Parser Error")

  /** Idempotent global registration (Spark keeps one dialect list per
    * JVM); every `jdbc:duckdb:` producer calls this before connecting. */
  @volatile private var registered = false
  def ensureRegistered(): Unit = if (!registered) synchronized {
    if (!registered) { JdbcDialects.registerDialect(this); registered = true }
  }
}
