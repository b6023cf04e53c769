package graft.runner.plugins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.operators.{CountMin, Funnel, Histogram, Retention, Scd2,
  TextStats}
import graft.runner._

/** Event-log analytics as runner steps — the downstream query layer
  * over the event-shaped staging tables the reference's pipelines land
  * (see [[graft.operators.Funnel]] for the operator contracts).
  */

/** Default `ts` expressions for event steps, chosen from the PHYSICAL
  * type the lake wrote — ns-precision BIGINT (the legacy convention),
  * naive `timestamp[us]` (Spark reads TIMESTAMP_NTZ; cast is
  * deterministic under the library's pinned UTC session timezone), or
  * an already-zoned TIMESTAMP. An explicit `ts_expr` arg always wins.
  */
private[plugins] object EventTs {
  /** SQL expression yielding epoch microseconds. */
  def microsExpr(df: DataFrame): String =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType)         => "ts div 1000"
      case Some(TimestampNTZType) => "unix_micros(cast(ts as timestamp))"
      case _                      => "unix_micros(ts)"
    }

  /** SQL expression yielding a session-zoned TIMESTAMP. */
  def timestampExpr(df: DataFrame): String =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType)         => "timestamp_micros(ts div 1000)"
      case Some(TimestampNTZType) => "cast(ts as timestamp)"
      case _                      => "ts"
    }
}

/** `event_funnel` — ordered conversion funnel ([[Funnel.steps]]).
  *
  * Args: `input` (event parquet), `output_path`, `stages` (ordered
  * list, required). Optional `user_col` (user_id), `kind_col`
  * (event_type), `ts_expr` (SQL expression yielding microseconds;
  * default adapts to the physical `ts` type — see [[EventTs]]).
  */
object EventFunnelPlugin extends StepPlugin {
  val name = "event_funnel"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val stages = ctx.argOpt("stages") match {
      case Some(l: Seq[_]) if l.nonEmpty => l.map(_.toString)
      case _ => sys.error("event_funnel: 'stages' list is required")
    }
    val userCol = ctx.argOpt("user_col").map(_.toString).getOrElse("user_id")
    val kindCol = ctx.argOpt("kind_col").map(_.toString).getOrElse("event_type")
    val input = ctx.spark.read.parquet(ctx.argStr("input"))
    val tsExpr = ctx.argOpt("ts_expr").map(_.toString)
      .getOrElse(EventTs.microsExpr(input))
    Funnel.steps(input,
        col(userCol), col(kindCol), expr(tsExpr), stages)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_entered" -> res.count(),
      "n_converted" ->
        res.filter(col("steps") === stages.size).count()))
  }
}

/** `event_retention` — cohort retention grid ([[Retention.cohorts]]).
  *
  * Args: `input`, `output_path`. Optional `user_col` (user_id),
  * `ts_expr` (SQL expression yielding a timestamp; default adapts to
  * the physical `ts` type — see [[EventTs]]).
  */
object EventRetentionPlugin extends StepPlugin {
  val name = "event_retention"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val userCol = ctx.argOpt("user_col").map(_.toString).getOrElse("user_id")
    val input = ctx.spark.read.parquet(ctx.argStr("input"))
    val tsExpr = ctx.argOpt("ts_expr").map(_.toString)
      .getOrElse(EventTs.timestampExpr(input))
    Retention.cohorts(input,
        col(userCol), expr(tsExpr))
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_cells" -> res.count(),
      "n_cohorts" -> res.select("cohort_day").distinct().count()))
  }
}

/** `event_scd2` — SCD type-2 history build ([[Scd2.build]]).
  *
  * Args: `input`, `output_path`, `attr_col` (required). Optional
  * `user_col` (user_id), `ts_expr` (microseconds; default adapts to
  * the physical `ts` type — see [[EventTs]]), `tiebreak_col`
  * (event_id).
  */
object EventScd2Plugin extends StepPlugin {
  val name = "event_scd2"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val attrCol = ctx.argStr("attr_col")
    val userCol = ctx.argOpt("user_col").map(_.toString).getOrElse("user_id")
    val input = ctx.spark.read.parquet(ctx.argStr("input"))
    val tsExpr = ctx.argOpt("ts_expr").map(_.toString)
      .getOrElse(EventTs.microsExpr(input))
    val tb = ctx.argOpt("tiebreak_col").map(_.toString).getOrElse("event_id")
    Scd2.build(input,
        col(userCol), col(attrCol), expr(tsExpr), col(tb))
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_intervals" -> res.count(),
      "n_current" -> res.filter(col("is_current") === 1).count()))
  }
}

/** `sketch_count_min` — build/merge a count-min frequency sketch and
  * optionally point-query it ([[graft.operators.CountMin]]).
  *
  * Args: `input`, `output_path` (the merged d×width counter grid — the
  * persistable rollup artifact). Token stream is either `token_col`
  * (pre-tokenized) or `text_col` (whitespace-tokenized here). Optional
  * `group_col` + `partials_path`: persist the PER-GROUP counter grids
  * too (the incremental form — a daily job appends its group's partial
  * and any consumer re-merges), with the merged grid then built from
  * the persisted partials, proving the round trip. `depth` (4),
  * `width` (256); `queries_input` + `estimates_path` to also write
  * point estimates for the distinct tokens of a query table
  * (`query_token_col` or `query_text_col`).
  */
object SketchCountMinPlugin extends StepPlugin {
  val name = "sketch_count_min"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val d = ctx.argOpt("depth").map(_.toString.toInt).getOrElse(4)
    val w = ctx.argOpt("width").map(_.toString.toInt).getOrElse(256)
    val raw = ctx.spark.read.parquet(ctx.argStr("input"))
    val grp = ctx.argOpt("group_col").map(c => col(c.toString))
      .getOrElse(lit("all"))
    val toks = (ctx.argOpt("token_col"), ctx.argOpt("text_col")) match {
      case (Some(t), _) => raw.select(grp.as("grp"),
        col(t.toString).as("w"))
      case (None, Some(t)) => raw.select(grp.as("grp"),
        explode(TextStats.tokens(col(t.toString))).as("w"))
      case _ => sys.error(
        "sketch_count_min: one of 'token_col' / 'text_col' is required")
    }
    val partials = CountMin.partials(toks, col("grp"), col("w"), d, w)
    // with partials_path the merged grid is built from the PERSISTED
    // per-group partials — the actual incremental-rollup round trip
    val mergeSrc = ctx.argOpt("partials_path") match {
      case Some(p) =>
        partials.write.mode("overwrite").parquet(p.toString)
        ctx.spark.read.parquet(p.toString)
      case None => partials
    }
    CountMin.merge(mergeSrc).write.mode("overwrite").parquet(out)
    val persisted = ctx.spark.read.parquet(out)
    val extra = ctx.argOpt("queries_input").map { qp =>
      val ep = ctx.argStr("estimates_path")
      val qraw = ctx.spark.read.parquet(qp.toString)
      val qtoks = (ctx.argOpt("query_token_col"),
          ctx.argOpt("query_text_col")) match {
        case (Some(t), _) => qraw.select(col(t.toString).as("token"))
        case (None, Some(t)) => qraw.select(
          explode(TextStats.tokens(col(t.toString))).as("token"))
        case _ => sys.error("sketch_count_min: queries_input needs one " +
          "of 'query_token_col' / 'query_text_col'")
      }
      CountMin.estimate(persisted, qtoks.distinct(), col("token"), d, w)
        .write.mode("overwrite").parquet(ep)
      Map("estimates_path" -> ep,
        "n_estimated" -> ctx.spark.read.parquet(ep).count())
    }.getOrElse(Map.empty[String, Any])
    StepResult(Map("output_path" -> out,
      "n_counters" -> persisted.count()) ++ extra)
  }
}

/** `sketch_quantiles` — mergeable-quantile rollup
  * ([[graft.operators.Histogram.quantilesFromPartials]]): per-group
  * fixed-width histogram partials merge by summing bin counts, then
  * quantiles interpolate inside the target rank's bin. Completes the
  * mergeable-sketch step family (HLL distinct / count-min frequency /
  * THIS for quantiles) — same incremental contract as
  * [[SketchCountMinPlugin]]: a daily job appends its group's partial
  * and any consumer re-merges.
  *
  * Args: `input`, `output_path` (the quantile estimates), `value_col`;
  * `width` (bin width, default 25.0), `origin` (default 0.0),
  * `quantiles` (YAML list, default [0.25, 0.5, 0.9, 0.99]). Optional
  * `group_col` + `partials_path`: persist the per-group bin grids and
  * rebuild the merged estimate from the PERSISTED partials (the
  * round-trip proof, mirroring sketch_count_min).
  */
object SketchQuantilesPlugin extends StepPlugin {
  val name = "sketch_quantiles"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val valueCol = ctx.argStr("value_col")
    val width = ctx.argOpt("width").map(_.toString.toDouble).getOrElse(25.0)
    val origin = ctx.argOpt("origin").map(_.toString.toDouble).getOrElse(0.0)
    val qs = ctx.argOpt("quantiles") match {
      case Some(l: Seq[_]) if l.nonEmpty => l.map(_.toString.toDouble)
      case Some(other) => sys.error(
        s"sketch_quantiles: 'quantiles' must be a list, got $other")
      case None => Seq(0.25, 0.5, 0.9, 0.99)
    }
    val raw = ctx.spark.read.parquet(ctx.argStr("input"))
    val grpKeys = ctx.argOpt("group_col").map(_.toString).toSeq
    val partials = Histogram(raw, grpKeys, col(valueCol), width, origin)
      .select((grpKeys.map(col) :+ col("bin") :+ col("n")): _*)
    // with partials_path the estimate is built from the PERSISTED
    // per-group grids — the actual incremental-rollup round trip
    val mergeSrc = ctx.argOpt("partials_path") match {
      case Some(p) =>
        partials.write.mode("overwrite").parquet(p.toString)
        ctx.spark.read.parquet(p.toString)
      case None => partials
    }
    Histogram.quantilesFromPartials(mergeSrc, width, origin, qs)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_quantiles" -> res.count()))
  }
}
