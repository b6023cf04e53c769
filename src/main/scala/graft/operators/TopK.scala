package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k (SURVEY §2.6 — absent from the reference's surface but
  * part of the engine's relational completeness; exercised on `orders`).
  *
  * `row_number` over a deterministic ordering (callers must include a
  * tie-breaking key). Scale: one shuffle on the group key; within each
  * partition Spark's WindowExec sorts — for huge groups prefer
  * rank-pruning via AQE or a groupBy(max_by) shape when k is tiny.
  */
object TopK {
  def perGroup(df: DataFrame, partKeys: Seq[String], order: Seq[Column],
               k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Global top-k with a deterministic total order. */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)
}
