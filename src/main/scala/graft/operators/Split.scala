package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines (train/val/
  * test): assignment is a pure function of the row's id — `md5(id)`
  * compared against precomputed hex thresholds — so it is reproducible
  * across runs, partitionings, engines and cluster sizes, and a row
  * NEVER migrates between splits when the corpus grows (the properties
  * a training split must have; `rand()`-based splits have none of
  * them, seed or not, because row order feeds the generator).
  *
  * Mechanics: md5 hex is uniform over [0, 16^32); comparing its first
  * 8 digits against the 8-hex-digit thresholds floor(cum_weight·16^8)
  * buckets rows proportionally with no hex→int parsing — plain string
  * comparison, bit-identical in every engine.
  */
object Split {

  /** 8-hex-digit threshold for a cumulative fraction. */
  private[operators] def hexThreshold(cum: Double): String =
    f"${math.min((cum * (1L << 32)).toLong, (1L << 32) - 1)}%08x"

  /** @param splits (name, weight) pairs in priority order; weights are
    *   normalized. @return df + `split` column. A NULL id yields a
    *   NULL split — never a silent assignment into the last bucket
    *   (which would contaminate a held-out set with unidentifiable
    *   rows); callers decide whether null ids are an error. */
  def assign(df: DataFrame, id: Column,
             splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits need positive weights")
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val key = substring(md5(id.cast("string")), 1, 8)
    val expr = splits.init.zip(cums.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cum), elseE) =>
      when(key < lit(hexThreshold(cum)), lit(name)).otherwise(elseE)
    }
    df.withColumn("split",
      when(id.isNull, lit(null).cast("string")).otherwise(expr))
  }

  /** Leakage-safe variant for near-dup corpora: the hash key is the
    * row's duplicate-cluster REPRESENTATIVE instead of its own id, so
    * every member of a cluster lands in the same split — a near-copy
    * of a training document can never surface in a held-out set (the
    * train/test contamination a plain per-id split silently allows
    * whenever dedup keeps more than one cluster member, e.g. under
    * soft dedup or a similarity threshold above the clustering one).
    * `rep` is nullable: rows outside any cluster fall back to their
    * own id, making this a strict generalization of [[assign]] (null
    * `rep` everywhere ≡ assign). Null id AND null rep yields a null
    * split, per the [[assign]] contract.
    *
    * Output adds both `rep` (the effective key — auditable) and
    * `split`. Cost over [[assign]] is only whatever join produced the
    * `rep` column; the assignment itself stays a stateless projection.
    */
  def assignByRepresentative(df: DataFrame, id: Column, rep: Column,
                             splits: Seq[(String, Double)]): DataFrame =
    assign(df.withColumn("rep", coalesce(rep, id)), col("rep"), splits)

  /** The same thresholds (and the null-id rule) as SQL, for oracles. */
  def sqlCase(idExpr: String, splits: Seq[(String, Double)]): String = {
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val key = s"substr(md5(CAST($idExpr AS VARCHAR)), 1, 8)"
    val whens = splits.init.zip(cums.init).map { case ((name, _), cum) =>
      s"WHEN $key < '${hexThreshold(cum)}' THEN '$name'"
    }.mkString(" ")
    s"CASE WHEN $idExpr IS NULL THEN NULL $whens " +
      s"ELSE '${splits.last._1}' END"
  }
}
