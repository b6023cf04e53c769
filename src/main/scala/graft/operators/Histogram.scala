package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width histogram (data-profiling family alongside [[Profile]]).
  *
  * bin = floor((v − origin)/width); one hash-aggregate with map-side
  * partials — O(bins) shuffle regardless of input size. Emits bin
  * bounds so the result is self-describing.
  */
object Histogram {
  def apply(df: DataFrame, keys: Seq[String], value: Column,
            width: Double, origin: Double = 0.0): DataFrame = {
    val bin = floor((value - lit(origin)) / lit(width)).cast("long")
    df.withColumn("__bin", bin)
      .groupBy((keys.map(col) :+ col("__bin")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("__bin") * width + origin)
      .withColumn("bin_hi", (col("__bin") + 1) * width + origin)
      .withColumnRenamed("__bin", "bin")
  }

  /** Mergeable-quantile workflow — the third member of the mergeable-
    * sketch family (HLL distinct, count-min frequency, THIS for
    * quantiles): per-shard fixed-width histogram partials merge by
    * summing bin counts (associative + commutative, so daily jobs
    * append partials and any consumer re-merges), then quantiles are
    * estimated by linear interpolation inside the bin holding the
    * target rank.
    *
    * Estimator contract (replicated verbatim by the oracle):
    * rank = ceil(q · N) over the merged total N; the winning bin is
    * the one with cum_before < rank ≤ cum_before + n; the estimate is
    * `origin + bin·width + width·((rank − cum_before)/n)` — exact
    * integer rank arithmetic, one double division, IEEE ops in a fixed
    * order, so cross-engine bit-equality holds.
    *
    * Scale shape: the merge is one hash aggregate to O(bins) rows; the
    * cumulative walk and the rank probe run on that bounded bin table
    * (the only non-equi join carries bins × |qs| rows — constant by
    * construction, like [[CountMin]]'s broadcast grid).
    */
  def quantilesFromPartials(partials: DataFrame, width: Double,
                            origin: Double,
                            qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val spark = partials.sparkSession
    import spark.implicits._
    val merged = partials.groupBy("bin").agg(sum("n").as("n"))
    // bounded (O(bins) rows): the global window is legal here, same as
    // Curriculum's per-bucket offsets
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    val cum = merged
      .withColumn("cum_before", coalesce(sum("n").over(w), lit(0L)))
    val total = merged.agg(sum("n").as("total"))
    val probes = qs.toDF("q").crossJoin(broadcast(total))
      .withColumn("rank",
        ceil(col("q") * col("total")).cast("long"))
    probes.join(broadcast(cum),
        col("rank") > col("cum_before") &&
          col("rank") <= col("cum_before") + col("n"))
      .select(col("q"),
        (lit(origin) + col("bin") * lit(width) + lit(width) *
          ((col("rank") - col("cum_before")).cast("double") /
            col("n").cast("double"))).as("est"),
        col("rank"), col("total"))
  }
}
