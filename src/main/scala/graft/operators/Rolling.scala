package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing rolling aggregate over a daily time axis (reference W1:
  * `geo_raster_running_window`,
  * /root/reference/pipelines/prism/stage-ts-ppt-day-mi-rollsum-{3,7,14,30}d.yml:23-33).
  *
  * Per-entity trailing N-day sums. A RANGE frame over epoch-day (not a
  * ROWS frame) so calendar gaps count as missing days — the reference's
  * input is one file per day, but a relational series may skip days.
  *
  * The reference reads all years but emits only `target_year`, with the
  * window looking back across the year boundary; callers reproduce that by
  * filtering AFTER this operator (read year±1, trim after), which
  * [[trimYear]] packages.
  *
  * Exactness: the windowed value should be decimal (see call sites) —
  * engines disagree on float summation order inside sliding frames
  * (DuckDB uses segment trees); decimal sums are order-independent.
  *
  * Scale: one shuffle on the partition key, then a sort within partitions;
  * all window widths computed in the same sort pass (same Window spec
  * modulo frame). Entities (cells) are numerous and small → no skew.
  */
object Rolling {
  def trailingDaySums(df: DataFrame, partKeys: Seq[String], dayCol: Column,
                      value: Column, windows: Seq[Int],
                      outPrefix: String = "rollsum"): DataFrame = {
    val withIdx = df
      .withColumn("__day_idx", datediff(dayCol, lit("1970-01-01")))
      .withColumn("__v", value)
    val base = Window
      .partitionBy(partKeys.map(col): _*)
      .orderBy(col("__day_idx"))
    windows.foldLeft(withIdx) { (acc, n) =>
      acc.withColumn(s"${outPrefix}_${n}d",
        sum(col("__v")).over(base.rangeBetween(-(n - 1), 0)).cast("double"))
    }.drop("__day_idx", "__v")
  }

  /** Reference semantics: window spans prior years, output trimmed to one. */
  def trimYear(df: DataFrame, dayCol: Column, targetYear: Int): DataFrame =
    df.filter(year(dayCol) === targetYear)
}
