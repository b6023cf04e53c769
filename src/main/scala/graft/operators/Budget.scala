package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation budgeting (north-star scope, SURVEY §7.6): the two
  * admission controls a training-data cut applies per source — a hard
  * token budget (take documents in deterministic order until the
  * source's allotment is spent) and a quality floor expressed as a
  * per-source percentile (drop each source's worst quartile rather
  * than applying one global threshold a high-quality source would
  * never touch and a low-quality source would sail through).
  *
  * Both are per-source ranked scans, and both use the [[SequencePack]]/
  * [[Curriculum]] two-pass prefix pattern over value-derived buckets
  * instead of a `PARTITION BY source` window: a per-source window
  * bounds parallelism by the number of DISTINCT sources (three giant
  * shards → three tasks); bucketing by the sort key's value range
  * decomposes the same running total/rank into sources × buckets
  * independent tasks plus one broadcast-sized offset table. Buckets
  * derive from the data, not physical partitioning, so results are
  * layout-independent and bit-equal to the naive windowed form — which
  * is what the oracles pin.
  */
object Budget {

  /** Hard per-source token budget: documents admit in (doc_id) order
    * until the running total would exceed `budget`; later docs are
    * marked dropped, NOT trimmed (a doc either ships whole or not at
    * all — the packing step owns intra-doc cuts). Returns every input
    * row with its running end and verdict, so the caller can audit
    * what the cap cost.
    *
    * @return (doc_id, source, n_tokens, cum_end, kept) */
  def capTokens(docs: DataFrame, docId: Column, source: Column,
                nTokens: Column, budget: Long,
                buckets: Int = 64): DataFrame = {
    require(budget >= 0 && buckets > 0)
    val base = docs.select(docId.as("doc_id"), source.as("source"),
      nTokens.cast("long").as("n_tokens"))
    val bounds = base.agg(min("doc_id"), max("doc_id"),
      count(lit(1)), count("doc_id")).head()
    if (bounds.getLong(2) == 0L)
      return base.withColumn("cum_end", lit(0L))
        .withColumn("kept", lit(true)) // empty input, empty output
    // a null doc_id has no place in the admission order — erroring here
    // beats the silent everything-kept bypass an all-null input would
    // otherwise take through the empty-input early return
    require(bounds.getLong(3) == bounds.getLong(2),
      "capTokens: null doc_id rows present — the admission order is " +
        "(doc_id), so null keys are undefined; filter or repair them first")
    val lo = bounds.getAs[Number](0).longValue()
    val hi = bounds.getAs[Number](1).longValue()
    val width = math.max(1L, (hi - lo) / buckets + 1)
    val bucket = expr(s"(doc_id - ${lo}L) div ${width}L")

    val localW = Window.partitionBy("source", "__bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__bucket", bucket)
      .withColumn("__local", sum("n_tokens").over(localW))

    val offW = Window.partitionBy("source").orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.withColumn("__bucket", bucket)
      .groupBy(col("source"), col("__bucket"))
      .agg(sum("n_tokens").as("__sub"))
      .withColumn("__off", coalesce(sum("__sub").over(offW), lit(0L)))
      .select(col("source"), col("__bucket"), col("__off"))

    local.join(broadcast(offsets), Seq("source", "__bucket"))
      .withColumn("cum_end", col("__off") + col("__local"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_end"), (col("cum_end") <= budget).as("kept"))
  }

  /** Per-source quality floor: percent_rank of `score` within each
    * source (ties broken by id — the order is total, so rank ==
    * row_number on both engines), keep iff rank ≥ `minPct`. The
    * percentile is (rank − 1)/(n − 1) — one double division of exact
    * integers, bit-equal cross-engine; 0.0 for a single-row source
    * (the SQL-standard percent_rank convention).
    *
    * The score keeps its ORIGINAL numeric type end to end: ranking and
    * output never touch an integer cast, so fractional quality scores
    * (an lm-score/dsir ratio like 0.73) rank correctly. Only the
    * bucket id derives from a double projection of the score — and a
    * monotone non-decreasing projection is all the bucket decomposition
    * needs (equal doubles land in one bucket; order within the bucket
    * is the original (score, doc_id) sort).
    *
    * @return (doc_id, source, score, pct_rank, kept) */
  def percentileFilter(docs: DataFrame, docId: Column, source: Column,
                       score: Column, minPct: Double,
                       buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    val base = docs.select(docId.as("doc_id"), source.as("source"),
      score.as("score"))
    val bounds = base.agg(min(col("score").cast("double")),
      max(col("score").cast("double")),
      count(lit(1)), count("score")).head()
    if (bounds.getLong(2) == 0L)
      return base.withColumn("pct_rank", lit(0.0))
        .withColumn("kept", lit(true)) // empty input, empty output
    require(bounds.getLong(3) == bounds.getLong(2),
      "percentileFilter: null score rows present — the rank order is " +
        "(score, doc_id), so null scores are undefined; filter or " +
        "impute them first")
    val lo = bounds.getDouble(0)
    val hi = bounds.getDouble(1)
    val width = (hi - lo) / buckets
    val bucket =
      if (width > 0)
        least(floor((col("score").cast("double") - lo) / width)
          .cast("long"), lit(buckets - 1L))
      else lit(0L) // all scores equal: one bucket

    // bucket ranges partition the SORT KEY, so cross-bucket order is
    // bucket order and the global per-source rank decomposes exactly
    val localW = Window.partitionBy("source", "__bucket")
      .orderBy("score", "doc_id")
    val local = base.withColumn("__bucket", bucket)
      .withColumn("__local", row_number().over(localW).cast("long"))

    val offW = Window.partitionBy("source").orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nW = Window.partitionBy("source")
    // ≤ sources × buckets rows: offsets AND per-source totals ride the
    // same broadcast
    val offsets = base.withColumn("__bucket", bucket)
      .groupBy(col("source"), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(offW), lit(0L)))
      .withColumn("__n", sum("__cnt").over(nW))
      .select(col("source"), col("__bucket"), col("__off"), col("__n"))

    local.join(broadcast(offsets), Seq("source", "__bucket"))
      .withColumn("__rank", col("__off") + col("__local"))
      .withColumn("pct_rank",
        when(col("__n") > 1,
          (col("__rank") - 1).cast("double") /
            (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .select(col("doc_id"), col("source"), col("score"), col("pct_rank"),
        (col("pct_rank") >= minPct).as("kept"))
  }
}
