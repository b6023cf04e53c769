package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Weighted zonal aggregate (reference A2:
  * `geo_county_weighted_raster_aggregate`,
  * /root/reference/pipelines/prism/prism-mi-corn-ppt-county.yml:71-85).
  *
  * Weighted mean Σ(w·v)/Σ(w) per key — the reference's crop-fraction-
  * weighted county precipitation. Products are computed in double (one
  * deterministic IEEE op per row), summed exactly via decimal, divided
  * once at the end.
  *
  * Scale: a single partial-aggregatable hash aggregate — two decimal sums
  * per group; shuffle is O(groups). No skew beyond the zone key itself.
  */
object WeightedZonal {
  def apply(df: DataFrame, keys: Seq[String], value: Column, weight: Column,
            outCol: String = "wavg"): DataFrame =
    // Spread.up by the zone keys — same one-split-scan rationale as
    // [[ZonalStats]]; the decimal-sum partials are the kernel
    Spread.up(df, keys.map(col): _*).groupBy(keys.map(col): _*)
      .agg(
        (Exact.dsum(value * weight) / Exact.dsum(weight)).as(outCol),
        Exact.dsum(value * weight).as(s"${outCol}_num"),
        Exact.dsum(weight).as(s"${outCol}_den"))
}
