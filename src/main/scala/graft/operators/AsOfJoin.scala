package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-table as-of join: for every left row, the latest right row with
  * the same key and `rightTime <= leftTime` (trades←quotes, orders←last
  * event, sensor←last calibration).
  *
  * Implemented as UNION + WINDOW, the shape that scales: tag both sides,
  * union on a common schema, one shuffle by key, one sort by (time,
  * side), then `last(value, ignoreNulls)` over the unbounded-preceding
  * frame carries the most recent right-side attributes forward into each
  * left row. Cost is one exchange + one sort over |L|+|R| — never a
  * per-row range probe, never a nested loop, and AQE handles hot keys.
  * Right side must be unique per (key, time); pre-aggregate it if not
  * (ties would otherwise be nondeterministic in ANY engine's as-of).
  */
object AsOfJoin {

  /** @param left/right inputs; @param key equi-key column name (same on
    *   both); @param leftTime/rightTime ordering columns (same type);
    *   @param rightVals right columns to carry (renamed as given).
    * @return left columns + one `last_<col>` per rightVal (null when no
    *   right row precedes). */
  def lastBefore(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String,
                 rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // common layout: key, __t, __side (right sorts before left at equal
    // times so same-instant right rows ARE visible), right vals, left cols
    val r = right.select(
      (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        rightVals.map(col) ++:
        leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
    val l = left.select(
      (col(key) +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        rightVals.map(c => lit(null).as(c)) ++:
        leftCols.filterNot(_ == key).map(col)): _*)
    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(r.unionByName(l)) { (df, v) =>
      df.withColumn(s"last_$v",
        last(when(col("__side") === 0, col(v)), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightVals.map(v => col(s"last_$v"))): _*)
  }
}
