package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Zonal statistics (reference A1: `geo_county_raster_aggregate`,
  * /root/reference/pipelines/prism/county_daily_aggregate.yml:24-36).
  *
  * Computes the reference's full stat set `min,p5,q1,med,avg,q3,p95,max`
  * per zone key, output columns `{prefix}_{stat}` mirroring the
  * reference's `{value_prefix}_{stat}` CSV columns
  * (county_daily_aggregate.yml:14-15,29).
  *
  * Exact `percentile` (not approx) to hash-match the DuckDB oracle; it is
  * a TypedImperativeAggregate with map-side partial aggregation (a
  * counts-map per group), so shuffle volume is O(groups × distinct values),
  * not O(rows).
  *
  * Scale: at 100 TB the group key is (zone, day) — millions of small
  * groups; buffers stay bounded by values-per-zone. A pathologically
  * hot zone is still one group: if its distinct-value count blows the
  * buffer, switch callers to `approx_percentile(..., accuracy)` — same
  * shape, bounded memory — or pre-round values to collapse the domain.
  */
object ZonalStats {
  val defaultPercentiles: Seq[(String, Double)] = Seq(
    "p5" -> 0.05, "q1" -> 0.25, "med" -> 0.5, "q3" -> 0.75, "p95" -> 0.95)

  def apply(df: DataFrame, keys: Seq[String], value: Column,
            prefix: String = "v",
            percentiles: Seq[(String, Double)] = defaultPercentiles): DataFrame = {
    val withV = df.withColumn("__zonal_v", value)
    val pctCol = expr(
      s"percentile(__zonal_v, array(${percentiles.map(_._2).mkString(",")}))")
    val flat = percentiles.zipWithIndex.map { case ((n, _), i) =>
      col("__pcts").getItem(i).as(s"${prefix}_$n")
    }
    // Spread.up by the zone keys: the percentile counts-map partials
    // are the CPU kernel — single-threaded on a one-split scan
    // otherwise (guide §2.5); hash(keys) satisfies the aggregate's
    // clustering, so no second exchange appears.
    Spread.up(withV, keys.map(col): _*).groupBy(keys.map(col): _*)
      .agg(
        min(col("__zonal_v")).as(s"${prefix}_min"),
        pctCol.as("__pcts"),
        Exact.davg(col("__zonal_v")).as(s"${prefix}_avg"),
        max(col("__zonal_v")).as(s"${prefix}_max"),
        count(col("__zonal_v")).as(s"${prefix}_n"))
      .select(keys.map(col) ++ Seq(col(s"${prefix}_min")) ++ flat ++
        Seq(col(s"${prefix}_avg"), col(s"${prefix}_max"), col(s"${prefix}_n")): _*)
  }
}
