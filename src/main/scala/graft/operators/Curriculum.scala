package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering for pretraining (north-star scope, SURVEY §7.6):
  * assign every document its global 1-based position in the
  * easy-to-hard training order — sort key (difficulty asc, id asc), the
  * classic length-first curriculum when difficulty is a token count.
  *
  * The naive form is `row_number() OVER (ORDER BY ...)` — a GLOBAL
  * window, which Spark executes by funneling the entire corpus into ONE
  * partition (the WindowExec single-partition warning); at 100 TB that
  * is the job. This is instead the same distributed two-pass prefix
  * pattern as [[SequencePack]], over value-derived difficulty buckets:
  *
  *  1. bucket = (difficulty − min) div width — contiguous ranges of the
  *     SORT KEY, so bucket order IS sort order across buckets and the
  *     global rank decomposes exactly;
  *  2. local pass: row_number within each bucket (parallelism =
  *     #buckets);
  *  3. offset pass: per-bucket counts (≤ `buckets` rows) cumsummed and
  *     broadcast back; position = bucket offset + local rank.
  *
  * Buckets derive from the DATA (not physical partitioning), so the
  * result is independent of cluster layout and identical to the naive
  * global window — which is what the oracle pins. Skewed difficulty
  * values concentrate rows in few buckets exactly as they would
  * concentrate equal sort keys anywhere; ties spread over `id` keep the
  * output total-ordered and deterministic.
  */
object Curriculum {

  /** @return (id, difficulty, pos) with `pos` the global 1-based rank
    * by (difficulty asc, id asc). */
  def order(df: DataFrame, id: Column, difficulty: Column,
            buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    val base = df.select(id.as("id"),
      difficulty.cast("long").as("difficulty"))
    // difficulty bounds: one constant-size aggregate (2 longs + counts)
    val bounds = base.agg(min("difficulty"), max("difficulty"),
      count(lit(1)), count("difficulty")).head()
    if (bounds.getLong(2) == 0L)
      return base.withColumn("pos", lit(0L)) // empty input, empty output
    // null difficulties have no rank position — error rather than let
    // them fall out of the bucket join silently
    require(bounds.getLong(3) == bounds.getLong(2),
      "Curriculum.order: null difficulty rows present — the sort key " +
        "is (difficulty, id), so null keys are undefined; filter or " +
        "impute them first")
    val lo = bounds.getAs[Number](0).longValue()
    val hi = bounds.getAs[Number](1).longValue()
    val width = math.max(1L, (hi - lo) / buckets + 1)
    val bucket = expr(s"(difficulty - ${lo}L) div ${width}L")

    val localW = Window.partitionBy("__bucket").orderBy("difficulty", "id")
    val local = base.withColumn("__bucket", bucket)
      .withColumn("__local", row_number().over(localW).cast("long"))

    val offW = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤ `buckets` rows: the only global window runs over a constant-
    // size aggregate, never the corpus
    val offsets = base.withColumn("__bucket", bucket)
      .groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(offW), lit(0L)))
      .select(col("__bucket"), col("__off"))

    local.join(broadcast(offsets), Seq("__bucket"))
      .select(col("id"), col("difficulty"),
        (col("__off") + col("__local")).as("pos"))
  }
}
