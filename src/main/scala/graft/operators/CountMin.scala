package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a MERGEABLE
  * frequency rollup — the heavy-hitter counterpart of the
  * `hll_partial_merge` workflow: a daily job persists per-partition
  * (d × width)-counter grids, any later consumer element-wise-sums the
  * grids and point-queries token frequencies with the classic
  * min-over-rows estimate (never an undercount; overcounts bounded by
  * n·e/width per row with probability 1-e^-d).
  *
  * The bucket hash is md5-prefix mod width in the [[Dsir.bucketOf]]
  * family — bit-identical in every engine, so unlike the opaque
  * Datasketches HLL binaries, the ENTIRE workflow (partials, merge,
  * estimates) is oracle-checkable hash-exact, not just an error
  * contract.
  *
  * Scale shape: a partial is a ≤ d·width-row aggregate of its group
  * (map-side combinable); the merged sketch is ≤ d·width rows TOTAL
  * (constant, default 1024) and broadcasts to the estimate join — the
  * corpus shuffles only to count, never to estimate.
  */
object CountMin {

  /** Row-`i` bucket of token `w`: md5("i:w") prefix mod `width`.
    * Codegen — md5/conv/pmod are native expressions. */
  def bucketOf(w: Column, i: Int, width: Int): Column =
    (conv(substring(md5(concat_ws(":", lit(i.toString), w)), 1, 6),
      16, 10).cast("long") % width).cast("int")

  private def hashed(tokens: DataFrame, tok: Column, d: Int,
                     width: Int): DataFrame =
    tokens.withColumn("__hb", explode(array((0 until d).map(i =>
        struct(lit(i).as("h"), bucketOf(tok, i, width).as("b"))): _*)))
      .select(tokens.columns.map(col) :+ col("__hb.h").as("h") :+
        col("__hb.b").as("b"): _*)

  /** Per-group sketch partials: one row per (group, h, b) counter that
    * any token of the group touched. `tokens` is one row per token
    * occurrence.
    *
    * Hashing happens AFTER a (group, token) pre-aggregate, not per
    * occurrence: the d md5 rows explode a vocabulary-sized frame
    * instead of the token stream (r12 — the occurrence-side explode
    * was count_min_merge's whole >2×-oracle gap), and the counter sums
    * weight each distinct token by its exact occurrence count —
    * arithmetic identical to counting occurrences directly. */
  def partials(tokens: DataFrame, grp: Column, tok: Column, d: Int = 4,
               width: Int = 256): DataFrame =
    partialsWeighted(
      tokens.select(grp.as("grp"), tok.as("__w"))
        .groupBy("grp", "__w").agg(count(lit(1)).as("__c")),
      col("grp"), col("__w"), col("__c"), d, width)

  /** Partials from a pre-counted (group, token, occurrences) frame —
    * the form a caller that already aggregated token counts (e.g. to
    * share one corpus shuffle with an exact heavy-hitter pass) feeds
    * directly. */
  def partialsWeighted(tokenCounts: DataFrame, grp: Column, tok: Column,
                       cnt: Column, d: Int = 4,
                       width: Int = 256): DataFrame =
    hashed(tokenCounts.select(grp.as("grp"), tok.as("__w"),
        cnt.as("__c")), col("__w"), d, width)
      .groupBy("grp", "h", "b").agg(sum(col("__c")).as("cnt"))

  /** Merge partials across groups: element-wise counter sum. ≤ d·width
    * rows out. */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy("h", "b").agg(sum(col("cnt")).as("cnt"))

  /** Point-query `queries` (one row per distinct token in `tok`)
    * against a merged sketch: estimate = min over the d counters.
    * The sketch is constant-size → broadcast. LEFT join + 0-fill: a
    * sparse sketch omits never-touched counter rows, and a queried
    * token hashing into one is the CMS answer "0" — an inner join
    * would silently drop the token (or min over fewer than d
    * counters, returning pure collision noise). */
  def estimate(sketch: DataFrame, queries: DataFrame, tok: Column,
               d: Int = 4, width: Int = 256): DataFrame =
    hashed(queries.select(tok.as("token")), col("token"), d, width)
      .join(broadcast(sketch), Seq("h", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy("token").agg(min(col("cnt")).as("cms_est"))
}
