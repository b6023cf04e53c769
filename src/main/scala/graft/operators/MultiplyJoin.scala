package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cellwise multiply against an aligned weight raster (reference J1:
  * `geo_raster_multiply`,
  * /root/reference/pipelines/prism/prism-mi-corn-ppt-county.yml:61-70 —
  * N daily rasters × one weight raster, inner equi-join on (x,y)).
  *
  * The weight side is small relative to the daily stack (one grid vs
  * 365+ of them), so it is broadcast: a hash probe per fact row, no
  * shuffle of the stack. The product column is one IEEE op per row,
  * computed inside codegen.
  */
object MultiplyJoin {
  def apply(facts: DataFrame, weights: DataFrame, keys: Seq[String],
            factValue: Column, weightValue: Column,
            outCol: String = "weighted"): DataFrame =
    facts.join(broadcast(weights), keys)
      .withColumn(outCol, factValue * weightValue)
}
