package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed catalog upsert (reference O8/O9: `catalog_json_upsert` /
  * `catalog_yaml_sync`, /root/reference/pipelines/tiger/county.yml:65-80 —
  * upsert a record into `catalog.json` keyed by `dataset_id`; the sync
  * variant protects managed fields via `overwrite_managed_fields: false`).
  *
  * MERGE semantics without Delta: full-outer join on the key, then
  * per-field `coalesce(updates, existing)` — updated fields win, missing
  * fields keep their old value, unmatched keys from either side survive.
  * `protectedFields` reproduces `overwrite_managed_fields: false`: those
  * columns prefer the EXISTING value.
  *
  * Scale: catalogs are metadata (≪ data); this is a small shuffle or
  * AQE-broadcast join regardless of fact-table volume.
  */
object CatalogMerge {
  def upsert(existing: DataFrame, updates: DataFrame, key: String,
             protectedFields: Set[String] = Set.empty): DataFrame = {
    val e = existing.alias("e")
    val u = updates.alias("u")
    val cols = existing.columns.filter(_ != key).map { c =>
      (if (protectedFields.contains(c))
        coalesce(col(s"e.$c"), col(s"u.$c"))
      else
        coalesce(col(s"u.$c"), col(s"e.$c"))).as(c)
    }
    val keyCol = coalesce(col(s"u.$key"), col(s"e.$key")).as(key)
    e.join(u, col(s"e.$key") === col(s"u.$key"), "full_outer")
      .select(keyCol +: cols.toSeq: _*)
  }
}
