package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** CorpusDiff: the four statuses, null-id exclusion, fingerprint-only
  * comparison (text equality, not object identity). */
class CorpusDiffSpec extends SparkSpecBase {

  test("diff: added/removed/changed/unchanged, null ids excluded") {
    import spark.implicits._
    val old = Seq(
      (Some(1L), "same"), (Some(2L), "will change"),
      (Some(3L), "gone"), (None: Option[Long], "null-id")
    ).toDF("doc_id", "text")
    val neu = Seq(
      (Some(1L), "same"), (Some(2L), "did change"),
      (Some(4L), "brand new"), (None: Option[Long], "null-id")
    ).toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, neu, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), got.toString)
  }

  test("diff: NULL text is content, not absence — presence comes from " +
    "the row, change from a null-safe fingerprint compare") {
    import spark.implicits._
    val old = Seq(
      (1L, Option("was text")), // text -> NULL        = changed
      (2L, None: Option[String]), // NULL -> text      = changed
      (3L, None: Option[String]), // NULL -> NULL      = unchanged
      (4L, None: Option[String]) // NULL-text removed  = removed
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, None: Option[String]),
      (2L, Option("now text")),
      (3L, None: Option[String]),
      (5L, None: Option[String]) // NULL-text added    = added
    ).toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, neu, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"), got.toString)
  }

  test("diff: equal text in different physical order is unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
      .repartition(3)
    val neu = Seq((2L, "x"), (1L, "a b c")).toDF("doc_id", "text")
      .coalesce(1)
    val st = CorpusDiff.diff(old, neu, col("doc_id"), col("text"))
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(st == Set("unchanged"), st.toString)
  }
}
