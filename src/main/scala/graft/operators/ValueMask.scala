package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pointwise value mask (reference P2: `geo_raster_value_mask`,
  * /root/reference/pipelines/prism/prism-mi-corn-ppt-county.yml:41-49 —
  * cells with value in `include_values` → 1, else 0; corn=1, soy=5).
  *
  * A pure projection — stays inside whole-stage codegen, never shuffles.
  */
object ValueMask {
  def apply(df: DataFrame, value: Column, include: Seq[Any],
            outCol: String = "mask"): DataFrame =
    df.withColumn(outCol,
      when(value.isin(include: _*), lit(1.0)).otherwise(lit(0.0)))
}
