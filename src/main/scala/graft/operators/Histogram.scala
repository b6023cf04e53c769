package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
