package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus term-distribution DRIFT audit — compare a new crawl's
  * unigram distribution against a reference corpus (yesterday's
  * training mix) and surface the most over-represented terms: the
  * mixture-shift check a continuously-refreshed training pipeline
  * runs before accepting a new cut (public idea: domain/term drift
  * monitoring; the DSIR-style importance ratio, here reported rather
  * than used to resample).
  *
  * Deliberately TRANSCENDENTAL-FREE: a KL term needs ln, whose libm
  * rounding differs across engines; Laplace-smoothed probability
  * RATIOS are exact rationals evaluated in two correctly-rounded IEEE
  * divisions, so the audit is bit-reproducible against the DuckDB
  * oracle (the [[graft.functions.Exact]] philosophy applied to
  * information-theoretic screening).
  *
  * Scale shape: per-side token counts are map-side-combinable
  * aggregates keyed by term; the two VOCABULARY-sized count tables
  * full-outer join on term; totals are ONE grand aggregate broadcast
  * back as a 1-row cross join (the established 1-row-count idiom);
  * the top-k is `orderBy.limit` = TakeOrderedAndProject (per-partition
  * heaps + a k-row driver merge, never a materialized global sort).
  */
object Drift {

  /** @return top-k terms by p_new/p_ref (desc; ties by term):
    *         (term, c_new, c_ref, p_new, p_ref, ratio). Probabilities
    *         are Laplace-smoothed over the SHARED vocabulary, so
    *         reference-absent terms rank by their new-side mass. */
  def termDrift(newDf: DataFrame, refDf: DataFrame, text: Column,
                topK: Int = 50): DataFrame = {
    require(topK >= 1)
    def counts(df: DataFrame, as: String) =
      // Spread.up: tokenize+explode+partial-agg single-threaded on a
      // one-split scan otherwise (guide §2.5)
      Spread.up(df.select(text.as("__t")))
        .select(explode(TextStats.tokens(col("__t"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as(as))
    // vocabulary-sized; feeds the totals aggregate AND the final
    // projection — persist per the multi-consumer rule
    val j = counts(newDf, "c_new")
      .join(counts(refDf, "c_ref"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("c_new"), lit(0L)).as("c_new"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = j.agg(sum("c_new").as("__nn"), sum("c_ref").as("__nr"),
      count(lit(1)).as("__v"))
    val pNew = (col("c_new") + 1).cast("double") /
      (col("__nn") + col("__v")).cast("double")
    val pRef = (col("c_ref") + 1).cast("double") /
      (col("__nr") + col("__v")).cast("double")
    j.crossJoin(broadcast(tot))
      .select(col("term"), col("c_new"), col("c_ref"),
        pNew.as("p_new"), pRef.as("p_ref"),
        (pNew / pRef).as("ratio"))
      .orderBy(col("ratio").desc, col("term"))
      .limit(topK)
  }

  /** Per-source out-of-vocabulary rate of a new corpus against the
    * REFERENCE vocabulary: the fraction of token OCCURRENCES whose
    * term the reference corpus never saw — the tokenizer/domain
    * coverage signal that decides whether a new source needs a vocab
    * refresh before it joins the mix. One distinct pass builds the
    * vocabulary-sized reference side; the new corpus's token stream
    * joins it keyed by term (shuffle-hash — the vocab grows with the
    * reference, so no broadcast assumption) and folds to one bounded
    * per-source row. Exact rational rate, one IEEE division.
    *
    * @return (source, n_tokens, n_oov, oov_rate) */
  def oovRate(newDf: DataFrame, refDf: DataFrame, text: Column,
              source: Column): DataFrame = {
    // Spread.up ×2: same one-split-scan rationale as [[termDrift]]
    val refVocab = Spread.up(refDf.select(text.as("__t")))
      .select(explode(TextStats.tokens(col("__t"))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .withColumn("__in_ref", lit(1))
    Spread.up(newDf.select(source.as("source"), text.as("__t")))
      .select(col("source"),
        explode(TextStats.tokens(col("__t"))).as("term"))
      .filter(length(col("term")) > 0)
      .join(refVocab.hint("shuffle_hash"), Seq("term"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_ref").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }
}
