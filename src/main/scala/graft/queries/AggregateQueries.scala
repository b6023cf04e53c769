package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.Exact
import graft.operators._

/** Aggregation + window surface (SURVEY §2.4/2.5): zonal stats, weighted
  * zonal, regrid, z-score climatology, rolling windows, profiling and
  * catalog merge — on the driver test tables per FIXTURES.md §A.
  */
object AggregateQueries extends QueryGroup {

  /** A1: zonal percentile stats per (user, day) — the reference's
    * min,p5,q1,med,avg,q3,p95,max set. */
  def a1ZonalStats(spark: SparkSession, dir: String): DataFrame =
    ZonalStats(
      Tables.events(spark, dir).withColumn("day", to_date(col("ts"))),
      Seq("user_id", "day"), col("value"), "val")

  /** A2: weighted mean Σwv/Σw per (supplier, ship day). */
  def a2Weighted(spark: SparkSession, dir: String): DataFrame =
    WeightedZonal(
      Tables.lineitem(spark, dir)
        .withColumn("ship_day", to_date(col("l_shipdate"))),
      Seq("l_suppkey", "ship_day"),
      col("l_extendedprice"), lit(1.0) - col("l_discount"), "wavg")

  /** A3: mean-downsample via computed affine bucket. */
  def a3Regrid(spark: SparkSession, dir: String): DataFrame =
    Regrid.meanByBucket(Tables.events(spark, dir),
      Regrid.affineBucket(col("user_id"), 0.0, 10.0), col("value"))

  /** A4: climatological z-score per (user, day-of-year). */
  def a4Zscore(spark: SparkSession, dir: String): DataFrame =
    ZScore(
      Tables.events(spark, dir).withColumn("doy", dayofyear(col("ts"))),
      Seq("user_id", "doy"), col("value"))
      .select(col("event_id"), col("user_id"), col("doy"), col("zscore"))

  /** W1: trailing 3/7/14/30-day rolling sums over the daily series. */
  def w1Rollsum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(Exact.DecimalT)).as("v_dec"))
    Rolling.trailingDaySums(daily, Seq("user_id"), col("day"),
      col("v_dec"), Seq(3, 7, 14, 30))
      .select(col("user_id"), col("day"),
        col("v_dec").cast("double").as("v"),
        col("rollsum_3d"), col("rollsum_7d"),
        col("rollsum_14d"), col("rollsum_30d"))
  }

  /** A5: single-pass dataset profile (long form, one row per column). */
  def a5Profile(spark: SparkSession, dir: String): DataFrame =
    Profile(Tables.customer(spark, dir))

  /** O8: keyed catalog upsert (full-outer merge, updates win). */
  def o8CatalogUpsert(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    def cat(df: DataFrame) = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        max(col("doc_id")).as("last_doc"))
    val existing = cat(d.filter(col("doc_id") < 250))
    val updates = cat(d.filter(col("doc_id") >= 200))
    CatalogMerge.upsert(existing, updates, "source")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_zonal_stats" -> (a1ZonalStats _),
    "a2_weighted" -> (a2Weighted _),
    "a3_regrid" -> (a3Regrid _),
    "a4_zscore" -> (a4Zscore _),
    "w1_rollsum" -> (w1Rollsum _),
    "a5_profile" -> (a5Profile _),
    "o8_catalog_upsert" -> (o8CatalogUpsert _))

  def oracles: Map[String, String] = {
    import Exact.sql._
    val qcols = ZonalStats.defaultPercentiles
      .map { case (n, p) => s"quantile_cont(\"value\", $p) AS val_$n" }
      .mkString(",\n  ")
    Map(
      "a1_zonal_stats" ->
        s"""SELECT user_id, CAST(ts AS DATE) AS day,
           |  MIN("value") AS val_min,
           |  $qcols,
           |  ${davg("\"value\"")} AS val_avg,
           |  MAX("value") AS val_max,
           |  COUNT("value") AS val_n
           |FROM events GROUP BY 1, 2""".stripMargin,
      "a2_weighted" ->
        s"""SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_day,
           |  ${dsum("l_extendedprice * (1.0 - l_discount)")} /
           |    ${dsum("(1.0 - l_discount)")} AS wavg,
           |  ${dsum("l_extendedprice * (1.0 - l_discount)")} AS wavg_num,
           |  ${dsum("(1.0 - l_discount)")} AS wavg_den
           |FROM lineitem GROUP BY 1, 2""".stripMargin,
      "a3_regrid" ->
        s"""SELECT CAST(FLOOR((user_id - 0.0) / 10.0) AS BIGINT) AS bucket,
           |  ${davg("\"value\"")} AS frac,
           |  COUNT("value") AS frac_n
           |FROM events GROUP BY 1""".stripMargin,
      "a4_zscore" ->
        s"""WITH clim AS (
           |  SELECT user_id, dayofyear(ts) AS doy,
           |    ${davg("\"value\"")} AS mu,
           |    ${dstddevSamp("\"value\"")} AS sigma
           |  FROM events GROUP BY 1, 2)
           |SELECT e.event_id, e.user_id, CAST(c.doy AS INT) AS doy,
           |  CASE WHEN c.sigma IS NULL OR c.sigma = 0.0 THEN NULL
           |       ELSE (e."value" - c.mu) / c.sigma END AS zscore
           |FROM events e JOIN clim c
           |  ON e.user_id = c.user_id AND dayofyear(e.ts) = c.doy""".stripMargin,
      "w1_rollsum" -> {
        def win(n: Int) =
          s"""CAST(CAST(SUM(v_dec) OVER (PARTITION BY user_id
             |    ORDER BY day - DATE '1970-01-01'
             |    RANGE BETWEEN ${n - 1} PRECEDING AND CURRENT ROW)
             |  AS VARCHAR) AS DOUBLE) AS rollsum_${n}d""".stripMargin
        s"""WITH daily AS (
           |  SELECT user_id, CAST(ts AS DATE) AS day,
           |    SUM(CAST("value" AS DECIMAL(30,10))) AS v_dec
           |  FROM events GROUP BY 1, 2)
           |SELECT user_id, day,
           |  CAST(CAST(v_dec AS VARCHAR) AS DOUBLE) AS v,
           |  ${win(3)}, ${win(7)}, ${win(14)}, ${win(30)}
           |FROM daily""".stripMargin
      },
      "a5_profile" -> {
        val cols = Seq(
          ("c_custkey", "bigint", true), ("c_name", "string", false),
          ("c_nationkey", "int", true), ("c_acctbal", "double", true),
          ("c_mktsegment", "string", false))
        cols.map { case (c, t, isNum) =>
          val minNum = if (isNum) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val maxNum = if (isNum) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
          val minStr = if (!isNum) s"MIN($c)" else "CAST(NULL AS VARCHAR)"
          val maxStr = if (!isNum) s"MAX($c)" else "CAST(NULL AS VARCHAR)"
          s"""SELECT '$c' AS "column", '$t' AS dtype,
             |  COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  $minNum AS min_num, $maxNum AS max_num,
             |  $minStr AS min_str, $maxStr AS max_str
             |FROM customer""".stripMargin
        }.mkString("\nUNION ALL\n")
      },
      "o8_catalog_upsert" ->
        """WITH cat_e AS (
          |  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
          |    MAX(doc_id) AS last_doc
          |  FROM documents WHERE doc_id < 250 GROUP BY source),
          |cat_u AS (
          |  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
          |    MAX(doc_id) AS last_doc
          |  FROM documents WHERE doc_id >= 200 GROUP BY source)
          |SELECT COALESCE(u.source, e.source) AS source,
          |  CAST(COALESCE(u.n_docs, e.n_docs) AS BIGINT) AS n_docs,
          |  CAST(COALESCE(u.total_chars, e.total_chars) AS BIGINT) AS total_chars,
          |  COALESCE(u.last_doc, e.last_doc) AS last_doc
          |FROM cat_e e FULL OUTER JOIN cat_u u ON e.source = u.source""".stripMargin)
  }
}
