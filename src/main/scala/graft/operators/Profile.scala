package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType, StringType}

/** Dataset profiling (reference A5: `vector_facts`,
  * /root/reference/pipelines/tiger/county.yml:36-41 — scan a dataset,
  * emit facts: row count, per-column schema/stats).
  *
  * Long-form output, one row per column:
  * `(column, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
  * min_str, max_str)` — numeric extremes only for numeric columns and
  * string extremes only for string columns, so no cross-engine
  * double→string formatting ever happens.
  *
  * Scale: a single pass — all per-column aggregates run in ONE
  * aggregation (no per-column jobs); `count_distinct` is exact (needed
  * for oracle parity); swap for `approx_count_distinct` at the 100 TB
  * tier where a 2% HLL error is acceptable.
  */
object Profile {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        count_distinct(c).as(s"${f.name}__dist")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            min(c).cast(DoubleType).as(s"${f.name}__minn"),
            max(c).cast(DoubleType).as(s"${f.name}__maxn"))
          case StringType => Seq(
            min(c).as(s"${f.name}__mins"),
            max(c).as(s"${f.name}__maxs"))
          case _ => Seq.empty
        })
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    def get[T](n: String): Option[Any] =
      if (row.schema.fieldNames.contains(n) && !row.isNullAt(row.fieldIndex(n)))
        Some(row.get(row.fieldIndex(n))) else None
    val out = df.schema.fields.map { f =>
      (f.name, f.dataType.simpleString,
        get(s"${f.name}__n").map(_.asInstanceOf[Long]).getOrElse(0L),
        get(s"${f.name}__nulls").map(_.asInstanceOf[Long]).getOrElse(0L),
        get(s"${f.name}__dist").map(_.asInstanceOf[Long]).getOrElse(0L),
        get(s"${f.name}__minn").map(_.asInstanceOf[Double]),
        get(s"${f.name}__maxn").map(_.asInstanceOf[Double]),
        get(s"${f.name}__mins").map(_.asInstanceOf[String]),
        get(s"${f.name}__maxs").map(_.asInstanceOf[String]))
    }.toSeq
    import spark.implicits._
    out.toDF("column", "dtype", "n_rows", "n_nulls", "n_distinct",
      "min_num", "max_num", "min_str", "max_str")
  }
}
