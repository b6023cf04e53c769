package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to overlapping [lo, hi)
  * intervals — rewritten as a bin equi-join.
  *
  * The naive formulation is a theta join (`p >= lo AND p < hi`), which
  * Spark can only execute as a BroadcastNestedLoopJoin (driver-bound
  * build side) or a cartesian product — both disqualifying at scale.
  * Binning makes it an equi-join: intervals explode into every
  * fixed-width bin they overlap, points compute their single bin, and
  * the join key is the bin id — a plain shuffle/broadcast HASH join,
  * partitionable across executors — followed by the exact residual
  * predicate. Replication factor per interval is span/binWidth + 1, so
  * `binWidth` trades shuffle volume against join selectivity exactly
  * like any spatial grid index.
  */
object RangeJoin {

  /** @param points fact side carrying numeric `pCol`
    * @param intervals interval side carrying `loCol` (inclusive) and
    *   `hiCol` (exclusive); intervals may overlap each other
    * @param binWidth grid width (same units as pCol) */
  def binned(points: DataFrame, pCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // bins only need to be a SUPERSET of those an interval touches (the
    // residual predicate removes false positives), so the exclusive hi
    // endpoint's bin is simply included — at most one spurious bin
    val bi = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val bp = points.withColumn("__bin",
      floor(col(pCol) / binWidth).cast("long"))
    bp.join(bi, "__bin")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }
}
