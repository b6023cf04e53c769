package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: documents are concatenated in a
  * deterministic order (doc_id within source) and cut every `seqLen`
  * tokens — each doc lands at (pack_id, pack_offset), the coordinates a
  * packed-batch loader needs.
  *
  * The naive form is one running cumsum windowed per source — but a
  * window `PARTITION BY source` bounds parallelism by the number of
  * DISTINCT sources: a corpus with three giant shards runs on three
  * tasks no matter how many executors exist. This is the classic
  * distributed prefix-sum instead, two passes over value-derived
  * buckets:
  *
  *  1. split each source's doc_id range into `buckets` contiguous
  *     sub-ranges (bucket = (doc_id - min) div width — derived from the
  *     DATA, not from physical partitioning, so both passes agree
  *     without a persist/recompute hazard and the result is independent
  *     of cluster layout);
  *  2. local pass: cumsum within (source, bucket) — parallelism is now
  *     sources × buckets;
  *  3. offset pass: per-(source, bucket) token subtotals (a tiny
  *     aggregate, one row per group) cumsummed across buckets and
  *     broadcast-joined back; global start = bucket offset + local
  *     cumsum.
  *
  * The only data-sized shuffles hash on (source, bucket); nothing
  * funnels a data-sized relation into one task. Exact integer
  * arithmetic end to end — bit-comparable across engines, and
  * associativity of + makes the regrouped sum equal the naive one.
  */
object SequencePack {

  def pack(docs: DataFrame, docId: Column, source: Column, nTokens: Column,
           seqLen: Int, buckets: Int = 64): DataFrame = {
    require(seqLen > 0 && buckets > 0)
    val base = docs.select(docId.as("doc_id"), source.as("source"),
      nTokens.cast("long").as("n_tokens"))

    // doc_id bounds: one constant-size aggregate (2 longs to the driver)
    val bounds = base.agg(min("doc_id"), max("doc_id")).head()
    if (bounds.isNullAt(0))
      return base.withColumn("pack_id", lit(0L))
        .withColumn("pack_offset", lit(0L)) // empty input, empty output
    val lo = bounds.getAs[Number](0).longValue()
    val hi = bounds.getAs[Number](1).longValue()
    val width = math.max(1L, (hi - lo) / buckets + 1)
    val bucket = expr(s"(doc_id - ${lo}L) div ${width}L")

    val localW = Window.partitionBy("source", "__bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("__bucket", bucket)
      .withColumn("__local", coalesce(sum("n_tokens").over(localW), lit(0L)))

    // subtotals: ≤ sources × buckets rows — broadcastable by construction
    val offW = Window.partitionBy("source").orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.withColumn("__bucket", bucket)
      .groupBy(col("source"), col("__bucket"))
      .agg(sum("n_tokens").as("__sub"))
      .withColumn("__off", coalesce(sum("__sub").over(offW), lit(0L)))
      .select(col("source"), col("__bucket"), col("__off"))

    local.join(broadcast(offsets), Seq("source", "__bucket"))
      .withColumn("__start", col("__local") + col("__off"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"__start div $seqLen").as("pack_id"),
        pmod(col("__start"), lit(seqLen.toLong)).as("pack_offset"))
  }
}
