package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.7: "skew handling on zonal joins — salting
  * for giant counties").
  *
  * AQE's skew-join split handles most cases at runtime; these helpers
  * are the explicit form for the two shapes AQE can't rewrite:
  * a skewed AGGREGATE key, and a skewed shuffle-join key where the
  * build side is too big to broadcast but small enough to replicate
  * `salts` times.
  */
object Skew {

  /** Two-phase salted aggregate: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. The salt spreads one hot group over
    * `salts` reducers; correctness requires the measure to be
    * decomposable (sum/count/min/max — pass partial and final exprs).
    *
    * The salt is derived from a distributor column (any well-spread
    * per-row value, e.g. the fact's unique id) — deterministic, no rand().
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                distributor: Column, salts: Int,
                outCol: String = "sum"): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(distributor), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value.cast(graft.functions.Exact.DecimalT)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("double").as(outCol))
  }

  /** Salted equi-join: facts get a deterministic salt in [0, salts);
    * the (non-broadcastable) dim side is replicated once per salt so
    * every fact row still finds its match. Result == plain inner join. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 distributor: Column, salts: Int): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(distributor), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFacts.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
