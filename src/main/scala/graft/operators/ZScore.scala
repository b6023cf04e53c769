package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Climatological z-score / SPI (reference A4: `geo_raster_spi.py`
  * `method: zscore`,
  * /root/reference/pipelines/prism/stage-ts-ppt-day-mi-spi-3d.yml:20-30).
  *
  * Standardizes each observation against the mean/σ of its climatology
  * group — in the reference, per (cell, day-of-year) across years.
  *
  * Implemented as groupBy → broadcast-or-shuffle join rather than a
  * window: the climatology aggregate shuffles only one row per group
  * (vs a full-data sort for `Window.partitionBy`), and the join back is
  * on the same key so AQE can pick a broadcast when the climatology side
  * is small. This is the shape that holds at 100 TB — the reference
  * needed a 16 G per-step memory request for the same computation
  * (stage-ts-ppt-day-mi-spi-3d.yml:23-24); here the stack never
  * materializes on one node.
  *
  * Moments use exact decimal sums (Σx, Σx²) so mean and σ are
  * bit-reproducible across engines; σ=0 groups yield null (guarded), and
  * n<2 groups yield null σ like `stddev_samp`.
  */
object ZScore {
  def apply(df: DataFrame, climKeys: Seq[String], value: Column,
            outCol: String = "zscore"): DataFrame = {
    // Spread.up by the climatology keys: one repartition serves BOTH
    // the climatology aggregate and the join back on the same keys
    // (hash(climKeys) satisfies each side's clustering); the decimal
    // moment partials parallelize past a one-split scan (guide §2.5).
    val withV = Spread.up(df.withColumn("__z_v", value),
      climKeys.map(col): _*)
    val clim = withV.groupBy(climKeys.map(col): _*)
      .agg(
        Exact.davg(col("__z_v")).as("__mu"),
        Exact.dstddevSamp(col("__z_v")).as("__sigma"))
    withV.join(clim, climKeys)
      .withColumn(outCol,
        when(col("__sigma").isNull || col("__sigma") === 0.0, lit(null))
          .otherwise((col("__z_v") - col("__mu")) / col("__sigma")))
      .drop("__z_v", "__mu", "__sigma")
  }
}
