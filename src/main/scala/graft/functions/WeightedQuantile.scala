package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Weighted quantile (SURVEY §2.4 A2 / §7 custom-Catalyst table: the one
  * aggregate the reference's weighted zonal family may need that Spark
  * lacks).
  *
  * Definition (lower weighted quantile): sort by value; the quantile is
  * the smallest value whose cumulative weight reaches q·Σw. Exact,
  * deterministic, and expressible in two forms:
  *
  *  - [[weightedQuantileByWindow]]: cumulative-weight window — the
  *    oracle-checkable form (same SQL runs in any engine), one shuffle +
  *    sort per group.
  *  - [[WeightedQuantileAgg]]: a typed `Aggregator` usable as a
  *    `TypedColumn` in `agg(...)` — single-pass, partial-aggregatable
  *    (buffers merge), the form you embed in a wide agg alongside other
  *    measures. Buffer holds the group's (value, weight) pairs, so use
  *    on bounded groups (zonal cells per county), like Spark's own
  *    exact `percentile`.
  */
object WeightedQuantile {

  /** Per-group lower weighted quantiles via cumulative-weight windows.
    * Returns one row per group with a column per requested q. */
  def weightedQuantileByWindow(df: DataFrame, keys: Seq[String],
                               value: Column, weight: Column,
                               qs: Seq[(String, Double)]): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(value.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = graft.operators.Spread.up(df, keyCols: _*)
      .withColumn("__v", value)
      .withColumn("__w", weight)
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__tw", sum(col("__w"))
        .over(Window.partitionBy(keyCols: _*)))
    val aggs = qs.map { case (name, q) =>
      min(when(col("__cw") >= col("__tw") * q, col("__v"))).as(name)
    }
    withCum.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB fragment for the same definition (used in oracle SQL):
    * one scalar subselect shape per quantile over a cum-weight CTE. */
  def sqlCumWeight(value: String, weight: String, partition: String): String =
    s"""SUM($weight) OVER (PARTITION BY $partition ORDER BY $value
       | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---- single-pass typed Aggregator form ----

  final case class VW(v: Double, w: Double)

  /** Typed aggregator: collects (v, w) pairs, merges buffers, finalizes
    * by sorting once. Exact same definition as the window form.
    *
    * MEMORY CONTRACT: the buffer holds every (v, w) pair of its group in
    * executor heap — exactly like Spark's own exact `percentile`. That
    * is safe for bounded groups (cells per county: ~10⁵) and WRONG for
    * unbounded ones; `maxGroupSize` (default 10M pairs ≈ 160 MB) fails
    * fast with a clear message instead of an opaque executor OOM. For
    * unbounded groups use [[weightedQuantileByWindow]] (sort-based,
    * spills) or an approximate sketch. */
  class WeightedQuantileAgg(q: Double, maxGroupSize: Int = 10_000_000)
      extends Aggregator[VW, ArrayBuffer[VW], Double] {
    private def guard(b: ArrayBuffer[VW]): ArrayBuffer[VW] = {
      if (b.size > maxGroupSize)
        throw new IllegalStateException(
          s"WeightedQuantileAgg group exceeds $maxGroupSize pairs; " +
            "use weightedQuantileByWindow (sort-based, spillable) for " +
            "unbounded groups")
      b
    }
    def zero: ArrayBuffer[VW] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[VW], a: VW): ArrayBuffer[VW] =
      guard({ b += a; b })
    def merge(b1: ArrayBuffer[VW], b2: ArrayBuffer[VW]): ArrayBuffer[VW] =
      guard(b1 ++= b2)
    def finish(b: ArrayBuffer[VW]): Double = {
      if (b.isEmpty) return Double.NaN
      val sorted = b.sortBy(_.v)
      val total = sorted.iterator.map(_.w).sum
      var cum = 0.0
      val it = sorted.iterator
      while (it.hasNext) {
        val x = it.next()
        cum += x.w
        if (cum >= total * q) return x.v
      }
      sorted.last.v
    }
    def bufferEncoder: Encoder[ArrayBuffer[VW]] =
      Encoders.kryo[ArrayBuffer[VW]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def weightedQuantile(q: Double): TypedColumn[VW, Double] =
    new WeightedQuantileAgg(q).toColumn
}
