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
    *   both); @param leftTime/rightTime ordering columns (same type;
    *   right rows with a NULL time never match, per SQL comparison
    *   semantics); @param rightVals right columns to carry (may repeat
    *   names present on the left — they come back as `last_<col>`).
    * @return left columns + one `last_<col>` per rightVal (null when no
    *   right row precedes). */
  def lastBefore(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String,
                 rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // The matched ROW is carried as one struct — carrying values
    // individually with last(ignoreNulls) would skip a matched row's
    // NULL field and resurrect an older value, diverging from as-of
    // semantics. The struct itself is non-null for every right row, so
    // ignoreNulls only skips interleaved LEFT rows. Struct nesting also
    // keeps rightVal names out of the union schema (no collision with
    // left columns).
    val r = right
      .filter(col(rightTime).isNotNull) // NULL time never matches (SQL)
      .select(
        (col(key) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
          struct(rightVals.map(col): _*).as("__rv") +:
          leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
    val l = left.select(
      (col(key) +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        lit(null).as("__rv") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    // right sorts before left at equal times, so same-instant right rows
    // ARE visible; a NULL leftTime sorts first (before any right row)
    // and therefore matches nothing — same as SQL
    val w = Window.partitionBy(key).orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l, allowMissingColumns = false)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightVals.map(v => col(s"__last.$v").as(s"last_$v"))): _*)
  }
}
