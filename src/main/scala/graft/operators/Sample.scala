package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified Bernoulli sampling — the quality/
  * domain-rebalancing step of a corpus pipeline (sample high-quality
  * strata at high rates, boilerplate-heavy strata low) with the same
  * reproducibility contract as [[Split]]: membership is a pure function
  * of the row id, so the sample is identical across runs, engines,
  * partitionings and corpus growth, and composes with train/val
  * splitting without correlation (the hash key is salted differently).
  *
  * Mechanics mirror [[Split]]: `md5(id || ":sample")` hex is uniform;
  * its first 8 digits compared against the stratum's 8-hex-digit
  * threshold floor(rate·16^8) keeps each stratum at its target rate via
  * plain string comparison — no hex parsing, bit-identical everywhere.
  * A stateless codegen projection: no shuffle, no state, linear scan.
  */
object Sample {

  private def thresholdFor(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    f"${math.min((rate * (1L << 32)).toLong, (1L << 32) - 1)}%08x"
  }

  private val salt = ":sample"

  /** df + `sampled` flag. NULL ids are never sampled (a row that cannot
    * be re-identified cannot be reproducibly re-sampled). Strata missing
    * from `rates` fall back to `defaultRate`. */
  def stratified(df: DataFrame, id: Column, stratum: Column,
                 rates: Map[String, Double],
                 defaultRate: Double): DataFrame = {
    val key = substring(md5(concat(id.cast("string"), lit(salt))), 1, 8)
    val thr = rates.toSeq.sortBy(_._1).foldRight(
      lit(thresholdFor(defaultRate)): Column) { case ((s, r), elseE) =>
      when(stratum === s, lit(thresholdFor(r))).otherwise(elseE)
    }
    df.withColumn("sampled",
      when(id.isNull, lit(false)).otherwise(key < thr))
  }

  private val ksalt = ":ksamp"

  /** The [[fixedPerGroup]] salted hash as a Column — shared with the
    * streaming bounded-sample state op
    * ([[graft.streaming.StreamOps.boundedGroupSample]]) so batch and
    * stream rank by the identical key. */
  def kSampleKey(id: Column): Column =
    md5(concat(id.cast("string"), lit(ksalt)))

  /** Deterministic uniform k-without-replacement sample PER GROUP —
    * the bounded-output companion to [[stratified]]'s rate sampling:
    * eval-subset construction, per-domain inspection samples, any
    * "exactly k rows from each stratum" cut. The k survivors are the
    * rows with the smallest `md5(id || ":ksamp")` in their group — a
    * uniform order statistic, reproducible across runs, engines and
    * partitionings, independent of [[Split]]/[[stratified]] membership
    * (different salt), and STABLE UNDER CORPUS GROWTH in the sense
    * that a row only leaves the sample when a new row hash-sorts below
    * it (expected k·(new/n) churn, vs total reshuffle for rand()).
    *
    * Scale shape: [[TopK.perGroup]] — one shuffle on the group key,
    * per-group WindowExec sort. NULL ids are never sampled (the
    * [[stratified]] rule), enforced before the window so a null-id row
    * cannot consume a rank slot. Output keeps `sample_rank` (1..k) —
    * a free uniform sub-sample handle: rank ≤ j is itself the
    * deterministic j-sample for any j ≤ k. */
  def fixedPerGroup(df: DataFrame, id: Column, group: Column,
                    k: Int): DataFrame =
    TopK.perGroup(
      df.filter(id.isNotNull)
        .withColumn("__kgrp", group)
        .withColumn("__kkey", kSampleKey(id)),
      Seq("__kgrp"), Seq(col("__kkey"), id), k, rankCol = "sample_rank")
      .drop("__kkey", "__kgrp")

  /** The [[fixedPerGroup]] rank as a SQL window expression fragment,
    * for oracles: `ROW_NUMBER() OVER (PARTITION BY <group> ORDER BY
    * md5(id||salt), id)`. */
  def fixedPerGroupRankSql(idExpr: String, groupExpr: String): String =
    s"""ROW_NUMBER() OVER (PARTITION BY $groupExpr
       |    ORDER BY md5(CAST($idExpr AS VARCHAR) || '$ksalt'), $idExpr)"""
      .stripMargin

  /** The same predicate as SQL, for oracles. */
  def sqlPredicate(idExpr: String, stratumExpr: String,
                   rates: Map[String, Double],
                   defaultRate: Double): String = {
    val key = s"substr(md5(CAST($idExpr AS VARCHAR) || '$salt'), 1, 8)"
    val whens = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN '$s' THEN '${thresholdFor(r)}'"
    }.mkString(" ")
    s"CASE WHEN $idExpr IS NULL THEN FALSE ELSE ($key < " +
      s"CASE $stratumExpr $whens ELSE '${thresholdFor(defaultRate)}' END)" +
      " END"
  }
}
