package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.operators.{Resample, Scrub, SpanDedup, TermIndex}

/** Corpus-curation term/span analytics over `documents`: distinctive-term
  * extraction, corpus-frequency quality scoring, inverted-index
  * construction, exact-substring duplication profiling, and the
  * source-pair overlap audit ([[graft.operators.TermIndex]],
  * [[graft.operators.SpanDedup]]).
  *
  * Cross-engine exactness: every compared number is an integer count or
  * ONE IEEE double division of two integer-exact values (division is
  * correctly rounded in both engines; `ln`-based idf would not be) — the
  * same discipline as the rest of the battery. Span queries hash-chain
  * shingles in Spark but count n-gram STRINGS in DuckDB; counts agree by
  * the dedup battery's counts-equivalence (collisions ≈ d²/2⁶⁴).
  */
object CorpusQueries extends QueryGroup {

  def tfidfTopK(spark: SparkSession, dir: String): DataFrame =
    TermIndex.tfidfTopK(Tables.documents(spark, dir), "doc_id",
      col("text"), k = 3)

  def tokenRarity(spark: SparkSession, dir: String): DataFrame =
    TermIndex.rarity(Tables.documents(spark, dir), "doc_id", col("text"))

  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    TermIndex.invertedIndex(Tables.documents(spark, dir), "doc_id",
      col("text"), n = 3, maxPostings = 5)

  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.dupSpans(Tables.documents(spark, dir), "doc_id",
      col("text"), n = 8)

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.sourceOverlap(Tables.documents(spark, dir), "doc_id",
      "source", col("text"), n = 8)

  def dupCoverage(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.dupCoverage(Tables.documents(spark, dir), "doc_id",
      col("text"), n = 8)

  /** Domain-mixture weights for the resample query: sources src0..19
    * rebalanced to a 1:2:3:4 cycling target share of a 1000-row budget
    * — small sources upsample (copies ≥ 2), big ones hash-thin. */
  private val mixWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (1.0 + i % 4)).toMap

  def mixtureResample(spark: SparkSession, dir: String): DataFrame =
    Resample.toMixture(
      Tables.documents(spark, dir).select("doc_id", "source"),
      col("doc_id"), col("source"), mixWeights, budget = 1000L)
      .select("doc_id", "source", "copy_idx")

  /** PII text synthesized deterministically from (doc_id, source) —
    * the corpus itself is digit-free, so both engines build the same
    * email/IP/phone-bearing string and the scrub counts are nonzero
    * and doc-varying (the `doc_id % 3` gateway IP toggles n_ips). */
  private def synthPii(c: DataFrame): Column = concat(
    lit("reach "), col("source"), lit("@mail.example.com or "),
    col("source"), lit(".ops@example.org from 10."),
    (col("doc_id") % 200).cast("string"), lit(".0."),
    (col("doc_id") % 250).cast("string"),
    when(col("doc_id") % 3 === 0, lit(" gw 192.168.1.1"))
      .otherwise(lit("")),
    lit(" tel 555-01"),
    lpad((col("doc_id") % 100).cast("string"), 2, "0"),
    lit(" "), col("text"))

  private val synthPiiSql =
    "'reach ' || source || '@mail.example.com or ' || source || " +
      "'.ops@example.org from 10.' || CAST(doc_id % 200 AS VARCHAR) || " +
      "'.0.' || CAST(doc_id % 250 AS VARCHAR) || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' gw 192.168.1.1' ELSE '' END || " +
      "' tel 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || " +
      "' ' || text"

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Scrub.scrub(d, col("doc_id"), synthPii(d))
  }

  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("source")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("total_tokens"),
        countDistinct("term").as("distinct_terms"),
        (countDistinct("term").cast("double") /
          count(lit(1)).cast("double")).as("type_token_ratio"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tfidf_topk" -> (tfidfTopK _),
    "token_rarity" -> (tokenRarity _),
    "inverted_index" -> (invertedIndex _),
    "dup_spans" -> (dupSpans _),
    "dup_coverage" -> (dupCoverage _),
    "source_overlap" -> (sourceOverlap _),
    "mixture_resample" -> (mixtureResample _),
    "pii_scrub" -> (piiScrub _),
    "vocab_growth" -> (vocabGrowth _))

  private val toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"

  /** Shared oracle CTE: one row per (doc_id, term, tf). */
  private val tfCte =
    s"""tf AS (
       |  SELECT doc_id, t AS term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)
       |  GROUP BY 1, 2)""".stripMargin

  /** Positional word 8-grams (the dup-span unit); i runs so each slice
    * has exactly 8 tokens — docs under 8 tokens emit nothing, matching
    * the Spark side's full-window filter. */
  private def gramCte(n: Int) =
    s"""tok AS (SELECT doc_id, source, $toks AS t FROM documents),
       |occ AS (
       |  SELECT doc_id, source, array_to_string(t[i:i+${n - 1}], ' ') AS s
       |  FROM tok CROSS JOIN unnest(range(1, len(t) - ${n - 2})) AS u(i))"""
      .stripMargin

  def oracles: Map[String, String] = Map(
    "tfidf_topk" ->
      s"""WITH $tfCte,
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
         |  CAST(df AS BIGINT) AS df,
         |  CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS weight, rank
         |FROM (
         |  SELECT doc_id, term, tf, df,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term)
         |      AS rank
         |  FROM tf JOIN df USING (term))
         |WHERE rank <= 3""".stripMargin,
    "token_rarity" ->
      s"""WITH $tfCte,
         |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf
         |  FROM tf GROUP BY 1)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
         |  MIN(cf) AS min_cf, MAX(cf) AS max_cf,
         |  CAST(CAST(SUM(tf * cf) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS mean_cf
         |FROM tf JOIN cf USING (term) GROUP BY 1""".stripMargin,
    "inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |  FROM tok CROSS JOIN unnest(range(1, len(t) - 1)) AS u(i))
         |SELECT s AS shingle, CAST(COUNT(*) AS BIGINT) AS df,
         |  array_to_string((list(doc_id ORDER BY doc_id))[1:5], ',')
         |    AS postings
         |FROM sh GROUP BY 1""".stripMargin,
    "dup_spans" ->
      s"""WITH ${gramCte(8)},
         |pd AS (SELECT doc_id, s, COUNT(*) AS c FROM occ GROUP BY 1, 2),
         |ds AS (SELECT s, COUNT(*) AS nd FROM pd GROUP BY 1)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total_spans,
         |  CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN c END), 0) AS BIGINT)
         |    AS dup_spans,
         |  CAST(COUNT(CASE WHEN nd >= 2 THEN 1 END) AS BIGINT)
         |    AS dup_shingles,
         |  CAST(CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN c END), 0)
         |      AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS dup_span_ratio
         |FROM pd JOIN ds USING (s) GROUP BY 1""".stripMargin,
    // merged-interval union length via gaps-and-islands: both engines
    // run the identical integer window recurrence (new island when the
    // 1-based position exceeds the running max interval end; coverage =
    // max−min+n per island, base-invariant), so covered_tokens is an
    // exact integer on both sides
    "dup_coverage" ->
      s"""WITH ${gramCte(8)},
         |pos AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s, i AS p
         |  FROM tok CROSS JOIN unnest(range(1, len(t) - 6)) AS u(i)),
         |dup AS (SELECT s FROM (
         |  SELECT s, COUNT(DISTINCT doc_id) AS nd
         |  FROM pos GROUP BY 1) WHERE nd >= 2),
         |dp AS (SELECT doc_id, p FROM pos JOIN dup USING (s)),
         |isl AS (SELECT doc_id, p,
         |  CASE WHEN p > COALESCE(MAX(p + 7) OVER (PARTITION BY doc_id
         |    ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    -1) THEN 1 ELSE 0 END AS newi
         |  FROM dp),
         |grp AS (SELECT doc_id, p,
         |  SUM(newi) OVER (PARTITION BY doc_id ORDER BY p) AS island
         |  FROM isl),
         |cov AS (SELECT doc_id,
         |  CAST(SUM(mx - mn + 8) AS BIGINT) AS covered_tokens
         |  FROM (SELECT doc_id, island, MAX(p) AS mx, MIN(p) AS mn
         |        FROM grp GROUP BY 1, 2) GROUP BY 1)
         |SELECT d.doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
         |  COALESCE(cov.covered_tokens, 0) AS covered_tokens,
         |  CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE)
         |    / CAST(len($toks) AS DOUBLE) AS coverage_ratio
         |FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id"""
        .stripMargin,
    "source_overlap" ->
      s"""WITH ${gramCte(8)},
         |sh AS (SELECT DISTINCT source, s FROM occ)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS shared_shingles
         |FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    "mixture_resample" -> Resample.oracleSql(
      "(SELECT doc_id, source FROM documents)", "doc_id", "source",
      mixWeights, budget = 1000L),
    "pii_scrub" -> Scrub.oracleSql(synthPiiSql, "documents"),
    "vocab_growth" ->
      s"""WITH tok AS (
         |  SELECT source, doc_id, unnest($toks) AS term FROM documents)
         |SELECT source,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS total_tokens,
         |  CAST(COUNT(DISTINCT term) AS BIGINT) AS distinct_terms,
         |  CAST(COUNT(DISTINCT term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS type_token_ratio
         |FROM tok GROUP BY 1""".stripMargin)
}
