package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact

/** Core relational queries over the TPC-H-ish driver tables.
  *
  * Every query here has a DuckDB oracle in [[oracles]]; aggregate doubles go
  * through [[graft.functions.Exact]] so both engines produce bit-identical
  * values regardless of partitioning/summation order.
  */
object CoreQueries extends graft.QueryGroup {

  /** Flagship pricing summary (TPC-H Q1 shape).
    * Scale: single hash-aggregate with map-side partial aggregation over a
    * handful of (flag, status) groups — shuffles only #groups × #partitions
    * rows. Safe at 100 TB; no skew risk (tiny key domain).
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    // Spread.up (keyless: 6 flag/status groups) AFTER the date filter:
    // the five decimal aggregates are the kernel, single-threaded on a
    // one-split lineitem scan otherwise (guide §2.5); the exchange
    // ships only the filtered, projected rows
    graft.operators.Spread.up(Tables.lineitem(spark, dir)
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracles: Map[String, String] = {
    import Exact.sql._
    Map(
      "q1_agg" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  ${dsum("l_quantity")} AS sum_qty,
           |  ${dsum("l_extendedprice")} AS sum_base_price,
           |  ${dsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
           |  ${davg("l_quantity")} AS avg_qty,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
           |GROUP BY l_returnflag, l_linestatus""".stripMargin
    )
  }
}
