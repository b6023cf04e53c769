package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered funnels, cohort retention, and SCD2
  * (slowly-changing-dimension) history building.
  *
  * The reference's surface is an ETL runner over event-shaped staging
  * tables (e.g. `/root/reference/pipelines/sample_step.yml` lands rows
  * keyed by entity + timestamp into an analytical store); these are the
  * standard downstream queries such a store exists to answer, so the
  * engine carries them as first-class, oracle-checked operators.
  *
  * Scale shape shared by all three: every join, window, and aggregate
  * below is keyed by the user/entity column — one hash partitioning,
  * reused across stages (Spark's EnsureRequirements elides the repeat
  * exchanges), no broadcast of anything row-count-sized, no global
  * window.
  */
object Funnel {

  /** Ordered-funnel timestamps: for each entity, the earliest `stages(0)`
    * event, then the earliest `stages(1)` event STRICTLY after it, and so
    * on — the classic "view → click → purchase" conversion chain where
    * each step must happen after the previous one (a purchase before the
    * first view does not count as conversion).
    *
    * Returns one row per entity that completed stage 0:
    * `(user_id, <stage>_ms ... , steps)` with -1 for unreached stages.
    *
    * Stage i is a conditional min-aggregate joined to stage i-1's result
    * on the entity key — i aggregates and i-1 joins, all on the same key,
    * so the chain costs ONE logical repartition of the event scan per
    * stage with no skew amplification (per-entity state is two longs).
    */
  def steps(events: DataFrame, user: Column, kind: Column, ts: Column,
            stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // Spread.up by entity: one repartition serves EVERY stage
    // aggregate and join in the chain (all keyed user_id) and
    // parallelizes the kernel past a one-split scan (guide §2.4/§2.5)
    val ev = Spread.up(events.select(user.as("user_id"),
      kind.as("__kind"), ts.as("__us")), col("user_id"))

    // stage 0: unconditional earliest occurrence
    val head = ev.filter(col("__kind") === stages.head)
      .groupBy("user_id").agg(min(col("__us")).as("__t0"))

    // stage i: earliest occurrence strictly after stage i-1's timestamp
    val reached = stages.zipWithIndex.tail.foldLeft(Seq(head)) {
      case (acc, (stage, i)) =>
        val prev = acc.last.select(col("user_id"), col(s"__t${i - 1}"))
        acc :+ ev.filter(col("__kind") === stage)
          .join(prev, "user_id")
          .filter(col("__us") > col(s"__t${i - 1}"))
          .groupBy("user_id").agg(min(col("__us")).as(s"__t$i"))
    }

    val joined = reached.tail.foldLeft(reached.head) { (l, r) =>
      l.join(r.select(col("user_id"), col(r.columns.last)),
        Seq("user_id"), "left")
    }
    val stepCols = stages.indices.map(i =>
      coalesce(expr(s"__t$i div 1000"), lit(-1L))
        .as(s"${stages(i)}_ms"))
    val nSteps = stages.indices.tail
      .map(i => when(col(s"__t$i").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    joined.select(col("user_id") +: stepCols :+
      nSteps.cast("int").as("steps"): _*)
  }
}

/** Cohort retention: bucket entities by first-seen day, then count how
  * many stay active k weeks later. */
object Retention {

  /** @return (cohort_day, week_offset, n_users, n_events): for each
    * first-seen day, how many of its users produced events `week_offset`
    * weeks after their first day, and how many events.
    *
    * Exact distinct per cell (cohort × offset cells are few: days ×
    * weeks-of-history). At 100 TB the first-seen aggregate and the
    * cell counts are both partial-agg friendly; the per-user first-day
    * join is key-partitioned. Swap `countDistinct` for
    * `approx_count_distinct` when cells × users no longer fit a
    * two-level exact distinct — the operator shape is unchanged. */
  def cohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    // Spread.up by entity — serves the first-touch aggregate AND the
    // join back (both keyed user_id); see Funnel.steps
    val ev = Spread.up(events.select(user.as("user_id"),
      to_date(ts).as("__day")), col("user_id"))
    val first = ev.groupBy("user_id").agg(min(col("__day")).as("cohort_day"))
    ev.join(first, "user_id")
      .select(col("cohort_day"),
        expr("datediff(__day, cohort_day) div 7").cast("int")
          .as("week_offset"),
        col("user_id"))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }
}

/** Trailing-window distinct actives (rolling DAU/WAU/MAU): per day, the
  * distinct entities seen in the last `windowDays` days. */
object RollingActives {

  /** @return (day, n_active) for every day with ≥1 event in-window.
    *
    * `COUNT(DISTINCT ...)` has no sliding-window form in any engine, so
    * the standard scale shape: distinct (entity, day) pairs, each
    * exploded to the `windowDays` report-days it contributes to, then
    * one exact distinct per report-day. Cost is windowDays × |distinct
    * pairs| rows into a partial-aggregating two-level distinct — linear
    * with a small constant, no per-day self-join of the event log, no
    * unbounded window. Report days with zero in-window activity are
    * absent (emitting them needs only a calendar-spine left join). */
  def distinctOverWindow(events: DataFrame, user: Column, ts: Column,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays > 0)
    val pairs = Spread.up(events
      .select(user.as("user_id"), to_date(ts).as("__day")),
      col("user_id"), col("__day")).distinct()
    pairs
      .select(col("user_id"), explode(sequence(lit(0),
        lit(windowDays - 1))).as("__off"), col("__day"))
      .select(col("user_id"),
        date_add(col("__day"), col("__off")).as("day"))
      // only days the log actually covers: join against the observed
      // day set so the trailing edge doesn't report phantom future days
      .join(pairs.select(col("__day").as("day")).distinct(), Seq("day"),
        "left_semi")
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }
}

/** SCD type-2 history: collapse an event stream into attribute validity
  * intervals — the "dimension table build" step of a warehouse load. */
object Scd2 {

  /** For each entity, the change-points of `attr` over time, each with
    * its validity window: `(user_id, attr, eff_from_ms, eff_to_ms,
    * is_current)` where `eff_to_ms` is the next change (-1 while
    * current). A row is a change-point when its attr differs from the
    * previous event's (or it is the entity's first event).
    *
    * `tiebreak` must make the per-entity ordering total (same-timestamp
    * events would otherwise make lag/lead nondeterministic).
    *
    * One shuffle: both windows and the filter share the same
    * (partition, order) so Spark plans a single exchange + sort. */
  def build(events: DataFrame, user: Column, attr: Column, ts: Column,
            tiebreak: Column): DataFrame = {
    // Null contract (shared with the streaming form,
    // [[graft.streaming.StreamOps.scd2Changes]]): a null attribute
    // carries no dimension value, so the event is IGNORED — dropped up
    // front on both sides. Without the filter the two forms diverge:
    // lag() can't tell "no predecessor" from "null predecessor", and
    // GroupState.update(null) throws. Pinned by StreamOpsSpec.
    // Spread.up by entity: the repartition satisfies both windows'
    // clustering (see Funnel.steps for the one-split-scan rationale)
    val ev = Spread.up(events.select(user.as("user_id"), attr.as("attr"),
        ts.as("__us"), tiebreak.as("__tb"))
      .filter(col("attr").isNotNull), col("user_id"))
    val w = Window.partitionBy("user_id").orderBy(col("__us"), col("__tb"))
    val changes = ev
      .withColumn("__prev", lag(col("attr"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("attr"))
    // the lead() below evaluates over the FILTERED rows (same spec, new
    // Window node) — same key + order, the sort survives the filter so
    // no second exchange (pinned in PlanShapeSpec)
    changes
      .withColumn("__next", lead(col("__us"), 1).over(w))
      .select(col("user_id"), col("attr"),
        expr("__us div 1000").as("eff_from_ms"),
        coalesce(expr("__next div 1000"), lit(-1L)).as("eff_to_ms"),
        when(col("__next").isNull, 1).otherwise(0).cast("int")
          .as("is_current"))
  }
}
