package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Grid downsampling by mean (reference A3: `geo_raster_reproject` with
  * `resampling: average`,
  * /root/reference/pipelines/prism/prism-mi-corn-ppt-county.yml:50-60 —
  * 30 m binary mask → PRISM-grid fractional coverage).
  *
  * The coarse key is a computed affine bucket (`floor((x-x0)/dx)`), so no
  * physical join against the template grid is needed — just a groupBy on
  * the derived key (SURVEY §2.3 J3). Mean via exact decimal sum.
  *
  * Scale: partial aggregation collapses each fine cell block map-side;
  * shuffle is O(coarse cells), ~676× smaller than the input for the
  * reference's 26×26 blocks.
  */
object Regrid {
  def meanByBucket(df: DataFrame, bucket: Column, value: Column,
                   bucketCol: String = "bucket",
                   outCol: String = "frac"): DataFrame =
    df.groupBy(bucket.as(bucketCol))
      .agg(Exact.davg(value).as(outCol), count(value).as(s"${outCol}_n"))

  /** 1-D affine bucket helper: floor((x - x0) / dx) as LONG. */
  def affineBucket(x: Column, x0: Double, dx: Double): Column =
    floor((x - lit(x0)) / lit(dx)).cast("long")
}
