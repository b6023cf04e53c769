package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning audit between two
  * versions of a document table: per id, whether the row was `added`,
  * `removed`, `changed` (text fingerprint differs) or `unchanged`.
  *
  * Shape at scale: both sides project to `(id, md5(text))` BEFORE the
  * join, so the full-outer equi-join ships 2×16-byte fingerprints per
  * row, never the text; one shuffle keyed by id, linear in the union
  * of the snapshots. The status column feeds the usual follow-ups
  * (re-embed only `added`+`changed`, tombstone `removed`) — the
  * incremental path that makes a 100 TB refresh touch only the delta.
  */
object CorpusDiff {

  /** @return one row per id in either snapshot: `(id, status)` with
    * status ∈ added | removed | changed | unchanged. NULL ids are
    * excluded on both sides (the [[Sample]]/[[Shard]] rule: an
    * unidentifiable row cannot be version-tracked).
    *
    * Presence and content are tracked SEPARATELY: added/removed branch
    * on explicit row-presence markers carried through the outer join —
    * never on fingerprint nullness, because `md5(NULL) IS NULL` and a
    * present-but-NULL-text row must not masquerade as absent. Content
    * change is a null-safe fingerprint compare (`<=>`), so NULL text on
    * both sides reads `unchanged` and NULL↔non-NULL reads `changed` —
    * the same truth table as SQL `IS DISTINCT FROM`. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           id: Column, text: Column): DataFrame = {
    val o = oldDf.filter(id.isNotNull)
      .select(id.as("id"), md5(text).as("__fp_old"),
        lit(true).as("__in_old"))
    val n = newDf.filter(id.isNotNull)
      .select(id.as("id"), md5(text).as("__fp_new"),
        lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
