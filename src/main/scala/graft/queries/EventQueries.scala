package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.operators.{Funnel, Retention, RollingActives, Scd2}

/** Event-log analytics over the `events` table: conversion funnels,
  * cohort retention, SCD2 dimension-history builds — the query family a
  * warehouse fed by the reference's event-staging pipelines exists to
  * answer (see [[graft.operators.Funnel]] for the scale notes).
  */
object EventQueries extends QueryGroup {

  /** view → click → purchase ordered funnel, per user. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    Funnel.steps(Tables.events(spark, dir),
      col("user_id"), col("event_type"), unix_micros(col("ts")),
      Seq("view", "click", "purchase"))

  /** Weekly retention grid by first-seen day. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    Retention.cohorts(Tables.events(spark, dir),
      col("user_id"), col("ts"))

  /** SCD2 validity intervals of each user's event_type stream. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame =
    Scd2.build(Tables.events(spark, dir),
      col("user_id"), col("event_type"), unix_micros(col("ts")),
      col("event_id"))

  /** 7-day rolling distinct active users (WAU) per day. */
  def rollingActives(spark: SparkSession, dir: String): DataFrame =
    RollingActives.distinctOverWindow(Tables.events(spark, dir),
      col("user_id"), col("ts"), windowDays = 7)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_steps" -> (funnelSteps _),
    "cohort_retention" -> (cohortRetention _),
    "scd2_build" -> (scd2Build _),
    "rolling_actives" -> (rollingActives _))

  def oracles: Map[String, String] = Map(
    // conditional-min chain: stage i's earliest event strictly after
    // stage i-1's timestamp, joined back left so partial funnels keep
    // their -1 sentinels
    "funnel_steps" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS kind, epoch_us(ts) AS us
        |  FROM events),
        |s0 AS (SELECT user_id, MIN(us) AS t0 FROM ev
        |       WHERE kind = 'view' GROUP BY 1),
        |s1 AS (SELECT ev.user_id, MIN(us) AS t1
        |       FROM ev JOIN s0 ON ev.user_id = s0.user_id
        |       WHERE kind = 'click' AND us > t0 GROUP BY 1),
        |s2 AS (SELECT ev.user_id, MIN(us) AS t2
        |       FROM ev JOIN s1 ON ev.user_id = s1.user_id
        |       WHERE kind = 'purchase' AND us > t1 GROUP BY 1)
        |SELECT s0.user_id,
        |  t0 // 1000 AS view_ms,
        |  COALESCE(t1 // 1000, -1) AS click_ms,
        |  COALESCE(t2 // 1000, -1) AS purchase_ms,
        |  CAST(1 + (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS INT)
        |    AS steps
        |FROM s0
        |LEFT JOIN s1 ON s0.user_id = s1.user_id
        |LEFT JOIN s2 ON s0.user_id = s2.user_id""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day,
        |  CAST((day - cohort_day) // 7 AS INT) AS week_offset,
        |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users,
        |  COUNT(*) AS n_events
        |FROM ev JOIN f ON ev.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    // change-points via lag, validity end via lead over the change rows
    "scd2_build" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS attr, epoch_us(ts) AS us,
        |    event_id FROM events),
        |m AS (
        |  SELECT *, LAG(attr, 1) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM ev),
        |c AS (SELECT user_id, attr, us, event_id FROM m
        |      WHERE prev IS NULL OR prev <> attr)
        |SELECT user_id, attr,
        |  us // 1000 AS eff_from_ms,
        |  COALESCE((LEAD(us, 1) OVER w) // 1000, -1) AS eff_to_ms,
        |  CAST(CASE WHEN LEAD(us, 1) OVER w IS NULL
        |    THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM c
        |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin,
    // sliding distinct has no window form in either engine — both sides
    // use the explode-to-report-day + exact-distinct shape, with report
    // days clamped to the observed day set
    "rolling_actives" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM pairs),
        |contrib AS (
        |  SELECT p.user_id, p.day + CAST(o AS INT) AS day
        |  FROM pairs p CROSS JOIN range(0, 7) r(o))
        |SELECT c.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT)
        |  AS n_active
        |FROM contrib c JOIN days d ON c.day = d.day
        |GROUP BY 1""".stripMargin)
}
