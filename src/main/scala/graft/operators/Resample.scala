package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture resampling — the "data mixing" step of a
  * pretraining pipeline: rebalance a corpus so each stratum (source /
  * domain / language) contributes its target share of a token/document
  * budget, upsampling small domains by integer replication and
  * downsampling large ones by hash-thinning. The reference's pipelines
  * stage per-domain datasets and combine them by authored file lists
  * (e.g. /root/reference/pipelines/prism/county_daily_aggregate_parent.yml
  * fans a fixed year list); at 100 TB the mixture itself must be an
  * operator, not an authored list.
  *
  * Reproducibility contract mirrors [[Sample]] and [[Split]]: the copy
  * count of a document is a pure function of (doc id, its stratum's
  * size, the target weights) — identical across runs, engines and
  * partitionings. Mechanics: for stratum s with n_s rows and target
  * row budget t_s = weight_s / Σweights · budget (a driver-side
  * constant), the replication rate is r_s = t_s / n_s. Every row gets
  * ⌊r_s⌋ copies; the fractional remainder is a Bernoulli(frac(r_s))
  * top-up decided by comparing the first 8 hex digits of
  * `md5(id || ":mix")` against `frac(r_s)` scaled to 32 bits — the
  * [[Sample]] threshold trick, except the threshold is computed
  * IN-PLAN (it depends on the stratum's measured size), formatted with
  * `lpad(lower(hex(...)), 8, '0')` so the string compare is numeric.
  *
  * 100 TB shape: one tiny aggregate (|strata| rows) broadcast-joined
  * back to the fact side, then a stateless projection + explode. No
  * driver collect, no shuffle of the corpus itself; output parallelism
  * follows the input partitioning.
  */
object Resample {

  private val salt = ":mix"

  /** One output row per (input row, copy_idx), copy_idx ∈ 1..copies.
    *
    * Budget accounting: shares are relative to the sum of the LISTED
    * weights — listing every stratum makes the expected output exactly
    * `budget` rows. A stratum missing from `weights` contributes an
    * ADDITIONAL `defaultWeight / Σweights · budget` expected rows
    * (0 ⇒ dropped); the per-stratum set need not be known up front,
    * which is what keeps the targets driver-resolvable constants that
    * the SQL oracle can reproduce literally. */
  def toMixture(df: DataFrame, id: Column, stratum: Column,
                weights: Map[String, Double], budget: Long,
                defaultWeight: Double = 0.0): DataFrame = {
    val wsum = weights.values.sum + 0.0
    require(wsum > 0, "mixture weights must sum > 0")
    // per-stratum target budgets, resolved on the driver so the only
    // in-plan float ops are the division by n_s and the 2^32 scaling —
    // both single correctly-rounded IEEE ops any engine reproduces
    val targets = weights.map { case (s, w) => s -> w / wsum * budget }
    val default = defaultWeight / wsum * budget
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val targetCol = targets.toSeq.sortBy(_._1).foldRight(
      lit(default): Column) { case ((s, t), elseE) =>
      when(col("__stratum") === s, lit(t)).otherwise(elseE)
    }
    val factors = counts.select(col("__stratum"),
      (targetCol / col("__n").cast("double")).as("__r"))
    val key8 = substring(md5(concat(id.cast("string"), lit(salt))), 1, 8)
    val thr8 = lpad(lower(hex(
      floor((col("__r") - floor(col("__r"))) * lit(4294967296.0))
        .cast("long"))), 8, "0")
    val copies = (floor(col("__r")).cast("long") +
      when(key8 < thr8, 1L).otherwise(0L)).as("__copies")
    df.join(broadcast(factors), stratum === col("__stratum"))
      .withColumn("__copies", copies)
      // null (not sequence(1,0), which would step BACKWARD) when a row
      // draws zero copies; explode emits no row for a null array
      .withColumn("copy_idx",
        explode(when(col("__copies") > 0,
          sequence(lit(1L), col("__copies")))
          .otherwise(lit(null).cast("array<bigint>"))))
      .drop("__stratum", "__r", "__copies")
  }

  /** The same program as DuckDB SQL over a table with the given id /
    * stratum columns, for oracles. Emits all source columns + copy_idx. */
  private val wsalt = ":wsamp"

  /** Deterministic per-row Bernoulli thinning by an IN-ROW probability
    * column — the consumer of soft-dedup cluster weights
    * ([[Components.memberWeights]]): sampling with p = 1/|cluster|
    * yields one expected survivor per duplicate cluster (hard dedup's
    * outcome in expectation) while staying unbiased within the
    * cluster, and composes with any other per-row probability (mixture
    * shares, quality scores). Same determinism contract as
    * [[toMixture]]'s fractional top-up: the keep decision is a pure
    * function of (id, weight) via the md5-hex threshold compare, so it
    * is reproducible across runs, engines and partitionings. `w ≥ 1`
    * keeps unconditionally — the 8-hex-digit threshold only covers
    * [0,1) (1.0 would scale to a 9-digit hex and lpad would TRUNCATE
    * it into garbage). A stateless projection + filter: no shuffle, no
    * aggregate, trivially 100 TB-safe. */
  def byWeight(df: DataFrame, id: Column, weight: Column): DataFrame = {
    val key8 = substring(md5(concat(id.cast("string"), lit(wsalt))), 1, 8)
    val thr8 = lpad(lower(hex(
      floor(weight * lit(4294967296.0)).cast("long"))), 8, "0")
    df.filter(weight >= 1.0 || key8 < thr8)
  }

  /** [[byWeight]]'s keep predicate as SQL, for oracles: `weightExpr`
    * must be the SAME arithmetic the engine-side column computes. */
  def byWeightPredicateSql(idExpr: String, weightExpr: String): String =
    s"""($weightExpr >= 1.0 OR
       |  substr(md5(CAST($idExpr AS VARCHAR) || '$wsalt'), 1, 8) <
       |  lpad(lower(hex(CAST(FLOOR(($weightExpr) * 4294967296.0)
       |    AS BIGINT))), 8, '0'))""".stripMargin

  def oracleSql(table: String, idExpr: String, stratumExpr: String,
                weights: Map[String, Double], budget: Long,
                defaultWeight: Double = 0.0): String = {
    val wsum = weights.values.sum + 0.0
    val targets = weights.map { case (s, w) => s -> w / wsum * budget }
    val default = defaultWeight / wsum * budget
    // Double.toString is shortest-roundtrip, so the literal parses back
    // to the identical IEEE double on the oracle side
    val whens = targets.toSeq.sortBy(_._1).map { case (s, t) =>
      s"WHEN '$s' THEN CAST(${t.toString} AS DOUBLE)"
    }.mkString(" ")
    s"""WITH n AS (
       |  SELECT $stratumExpr AS st, COUNT(*) AS n_s FROM $table GROUP BY 1),
       |f AS (
       |  SELECT st,
       |    (CASE st $whens ELSE CAST(${default.toString} AS DOUBLE) END)
       |      / CAST(n_s AS DOUBLE) AS r
       |  FROM n),
       |c AS (
       |  SELECT d.*,
       |    CAST(FLOOR(r) AS BIGINT) +
       |    CASE WHEN substr(md5(CAST($idExpr AS VARCHAR) || '$salt'), 1, 8)
       |      < lpad(lower(hex(CAST(FLOOR((r - FLOOR(r)) * 4294967296.0)
       |          AS BIGINT))), 8, '0')
       |    THEN 1 ELSE 0 END AS copies
       |  FROM $table d JOIN f ON $stratumExpr = f.st)
       |SELECT c.* EXCLUDE (copies), CAST(u.i AS BIGINT) AS copy_idx
       |FROM c CROSS JOIN unnest(range(1, copies + 1)) AS u(i)""".stripMargin
  }
}
