package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — redact emails, IPv4 addresses and phone-shaped
  * digit runs from a text column, emitting the cleaned text plus
  * per-category match counts (the audit trail a curation pipeline
  * keeps). A standard pre-release step for LLM training corpora; the
  * reference's surface stops at download/stage (its corpora are
  * rasters), so this extends the engine's text battery the same way
  * the dedup/quality operators do.
  *
  * The patterns are the portable regex subset shared by Java's engine
  * (Spark) and RE2 (DuckDB, Go): character classes, bounded repeats
  * and `\b` word boundaries only — no lookaround, no backreferences —
  * so one pattern string drives both the engine and the SQL oracle.
  * Replacement order matters and is fixed: emails first (their local
  * parts may contain digits and dots that the looser patterns would
  * otherwise claim), then IPs, then phones.
  *
  * 100 TB shape: a stateless projection — regexp_count/replace are
  * codegen'd Spark built-ins; no shuffle, no state, linear scan.
  */
object Scrub {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** doc_id + n_emails / n_ips / n_phones + `clean` (all three
    * categories replaced by sentinel tokens). */
  def scrub(df: DataFrame, id: Column, text: Column): DataFrame = {
    val noEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipRe, "<IP>")
    val clean = regexp_replace(noIp, phoneRe, "<PHONE>")
    df.select(
      id.as("doc_id"),
      regexp_count(text, lit(emailRe)).cast("long").as("n_emails"),
      // count IP/phone on the email-scrubbed text, exactly the strings
      // the replacements below will see
      regexp_count(noEmail, lit(ipRe)).cast("long").as("n_ips"),
      regexp_count(noIp, lit(phoneRe)).cast("long").as("n_phones"),
      clean.as("clean"))
  }

  /** The same program as DuckDB SQL: `textExpr` is the input text
    * expression, `fromClause` supplies doc_id. */
  def oracleSql(textExpr: String, fromClause: String): String =
    s"""WITH t0 AS (SELECT doc_id, $textExpr AS txt FROM $fromClause),
       |t1 AS (SELECT doc_id, txt,
       |  regexp_replace(txt, '$emailRe', '<EMAIL>', 'g') AS ne FROM t0),
       |t2 AS (SELECT doc_id, txt, ne,
       |  regexp_replace(ne, '$ipRe', '<IP>', 'g') AS ni FROM t1)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(txt, '$emailRe')) AS BIGINT)
       |    AS n_emails,
       |  CAST(len(regexp_extract_all(ne, '$ipRe')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(ni, '$phoneRe')) AS BIGINT)
       |    AS n_phones,
       |  regexp_replace(ni, '$phoneRe', '<PHONE>', 'g') AS clean
       |FROM t2""".stripMargin
}
