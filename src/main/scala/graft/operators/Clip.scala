package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Spatial/dimension clip (reference P1: `geo_clip_raster_by_polygon`,
  * /root/reference/pipelines/prism/stage-ts-ppt-day-state.yml:24-35 —
  * keep cells inside the polygons whose attribute matches, e.g.
  * `STUSPS == "MI"`).
  *
  * Relational form: a LEFT SEMI join of the fact table against a filtered
  * dimension — rows survive, no dimension columns leak, no row
  * duplication if the dimension key repeats. The dimension is broadcast
  * (counties/states are tiny next to the raster stack), so the clip costs
  * one scan of the facts with a build-side hash probe — no shuffle.
  *
  * Scale: at 100 TB the facts never move; broadcast is O(|dim|). If the
  * selector ever exceeds broadcast size, drop the hint and let AQE pick
  * a shuffled semi join.
  */
object Clip {
  def semi(facts: DataFrame, dim: DataFrame, dimFilter: Column,
           joinCond: Column): DataFrame =
    facts.join(broadcast(dim.filter(dimFilter)), joinCond, "left_semi")

  /** Equi-key convenience: clip facts on `key` ∈ σ(filter)(dim).`key`. */
  def semiOn(facts: DataFrame, dim: DataFrame, dimFilter: Column,
             key: String): DataFrame =
    facts.join(broadcast(dim.filter(dimFilter).select(key).distinct()),
      Seq(key), "left_semi")
}
