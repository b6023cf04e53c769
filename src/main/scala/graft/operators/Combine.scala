package graft.operators

import org.apache.spark.sql.DataFrame

/** Schema-aligned union (reference S6: `combine_files.py`,
  * /root/reference/pipelines/prism/county_daily_aggregate.yml:38-44 —
  * concatenate per-day CSVs into one file).
  *
  * `unionByName(allowMissingColumns = true)` aligns by column NAME, not
  * position, and null-fills columns absent on one side — matching the
  * reference's header-aware CSV concatenation. A union is plan-level
  * only (no shuffle); the reference's single-output-file mode maps to
  * `.coalesce(1).write` at the sink, which callers opt into explicitly
  * because it serializes the final write.
  */
object Combine {
  def unionAll(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
}
