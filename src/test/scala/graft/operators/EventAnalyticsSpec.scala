package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Funnel / Retention / Scd2 unit contracts on hand-computable event
  * fixtures (timestamps are raw microseconds so expected ms values are
  * readable). */
class EventAnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  // (user, kind, us, id)
  private def ev(rows: (Long, String, Long, Long)*) =
    rows.toDF("u", "k", "us", "id")

  test("Funnel: strict ordering — later-stage events before the previous stage don't count") {
    // u1 completes view->click->purchase in order;
    // u2 purchases BEFORE clicking: purchase must not count;
    // u3 has only a click (no view): excluded entirely (no stage-0 row)
    val e = ev(
      (1L, "view", 1000000L, 1), (1L, "click", 2000000L, 2),
      (1L, "purchase", 3000000L, 3),
      (2L, "view", 1000000L, 4), (2L, "purchase", 1500000L, 5),
      (2L, "click", 2000000L, 6),
      (3L, "click", 1000000L, 7))
    val out = Funnel.steps(e, col("u"), col("k"), col("us"),
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getLong(1) == 1000L && r1.getLong(2) == 2000L &&
      r1.getLong(3) == 3000L && r1.getInt(4) == 3)
    val r2 = out(1)
    // u2: purchase at 1.5s precedes the first click at 2s -> unreached
    assert(r2.getLong(2) == 2000L && r2.getLong(3) == -1L &&
      r2.getInt(4) == 2)
  }

  test("Funnel: earliest qualifying occurrence wins, duplicates ignored") {
    val e = ev(
      (1L, "view", 5000000L, 1), (1L, "view", 1000000L, 2),
      (1L, "click", 3000000L, 3),  // before the LATER view but after min
      (1L, "click", 9000000L, 4))
    val out = Funnel.steps(e, col("u"), col("k"), col("us"),
      Seq("view", "click")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1000L)  // min view
    assert(out(0).getLong(2) == 3000L)  // min click after min view
  }

  test("Retention: cohort day is per-user min; offsets bucket by 7 days") {
    val day0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(
      day0.getTime + d * 86400000L)
    val e = Seq(
      (1L, ts(0)), (1L, ts(3)), (1L, ts(7)),   // offsets 0,0,1
      (2L, ts(1)), (2L, ts(15)))               // cohort day1: offsets 0,2
      .toDF("u", "ts")
    val out = Retention.cohorts(e, col("u"), col("ts"))
      .orderBy("cohort_day", "week_offset").collect()
    assert(out.map(r => (r.getDate(0).toString, r.getInt(1),
      r.getLong(2), r.getLong(3))).toSeq == Seq(
      ("2024-01-01", 0, 1L, 2L), ("2024-01-01", 1, 1L, 1L),
      ("2024-01-02", 0, 1L, 1L), ("2024-01-02", 2, 1L, 1L)))
  }

  test("Scd2: collapses runs, keeps change-points, validity chains with -1 tail") {
    val e = ev(
      (1L, "free", 1000000L, 1), (1L, "free", 2000000L, 2),
      (1L, "paid", 3000000L, 3), (1L, "free", 4000000L, 4),
      (2L, "paid", 1000000L, 5))
    val out = Scd2.build(e, col("u"), col("k"), col("us"), col("id"))
      .orderBy("user_id", "eff_from_ms").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getInt(4))).toSeq == Seq(
      (1L, "free", 1000L, 3000L, 0),  // run of two collapses to one row
      (1L, "paid", 3000L, 4000L, 0),
      (1L, "free", 4000L, -1L, 1),    // re-entering a past value is a new interval
      (2L, "paid", 1000L, -1L, 1)))
  }

  test("RollingActives: trailing 7-day distinct, clamped to observed days") {
    val day0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(day0.getTime + d * 86400000L)
    // u1 on days 0 and 8; u2 on day 0 twice (dup must not double-count)
    val e = Seq((1L, ts(0)), (1L, ts(8)), (2L, ts(0)), (2L, ts(0)))
      .toDF("u", "ts")
    val out = RollingActives.distinctOverWindow(e, col("u"), col("ts"), 7)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    // observed days are only {0, 8}: day0 window sees both users,
    // day8 window (days 2-8) sees only u1's day-8 event
    assert(out == Seq(("2024-01-01", 2L), ("2024-01-09", 1L)))
  }

  test("Scd2: same-timestamp events break ties by the tiebreak column") {
    val e = ev((1L, "a", 1000000L, 2), (1L, "b", 1000000L, 1))
    val out = Scd2.build(e, col("u"), col("k"), col("us"), col("id"))
      .orderBy("eff_from_ms", "attr").collect()
    // order is (b, id=1) then (a, id=2): two change-points
    assert(out.length == 2)
    assert(out.map(_.getString(1)).toSet == Set("a", "b"))
    assert(out.count(_.getInt(4) == 1) == 1) // exactly one current row
  }
}
