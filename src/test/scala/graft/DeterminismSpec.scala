package graft

import org.apache.spark.sql.DataFrame

/** Partitioning-invariance: the oracle battery's cross-engine
  * bit-equality rests on every query being a pure function of its
  * input DATA, not of physical layout. This runs a representative
  * slice of the battery twice — once on the suite session (4 shuffle
  * partitions) and once on a session forced to a co-prime partition
  * count with AQE off — and requires identical sorted results.
  * Decimal-exact aggregation (the `Exact` discipline), deterministic
  * tie-breaks, and seed-free hashing are what make this hold; a
  * regression here would surface as driver-oracle flake at scale.
  */
class DeterminismSpec extends SparkSpecBase {

  // one query per determinism mechanism it exercises
  private val sample: Seq[(String, String)] = Seq(
    "q1_agg" -> "decimal-exact sums",
    "a1_zonal_stats" -> "exact percentile tie handling",
    "stats_moments" -> "closed-form variance over decimal sums",
    "dedup_jaccard" -> "posting self-join + ratio",
    "minhash_lsh_candidates" -> "md5 min-wise hashing",
    "sim_topk" -> "cosine + rank window tie-break",
    "ivf_ann" -> "k-means chain + probe routing",
    "topk_per_group" -> "window tie-break",
    "sequence_pack" -> "two-pass prefix sum regrouping",
    "curriculum_order" -> "two-pass rank bucketing",
    "pagerank" -> "iterative decimal in-mass",
    "bm25_topk" -> "IEEE score chain + rank",
    "dsir_weights" -> "hashed-bucket ratios",
    "stratified_sample" -> "salted md5 thresholds",
    "funnel_steps" -> "conditional-min stage chain",
    "scd2_build" -> "tiebroken lag/lead intervals",
    "count_min_merge" -> "md5 counter grid + min estimate",
    "gap_fill_ffill" -> "max_by day value + ignoreNulls ffill",
    "triangle_count" -> "orientation-invariant triad census",
    "token_budget_cap" -> "two-pass running total + threshold",
    "quality_percentile_filter" -> "two-pass (rank-1)/(n-1) double",
    "bpe_learn" -> "per-round argmax with total-order tie-break",
    "k_core" -> "checkpointed peel loop, integer degrees",
    "hist_quantile_merge" -> "integer ranks + fixed IEEE interpolation",
    "sparse_cosine_pairs" -> "decimal-exact sparse dot products",
    "leakage_safe_split" -> "md5 split keyed on cluster representative",
    "weighted_sample" -> "in-row Bernoulli md5 threshold",
    "topic_cooccurrence" -> "exact-integer lift division",
    "group_sample" -> "salted-hash order statistic rank",
    "corpus_shuffle" -> "salted-hash permutation + partitioned rank",
    "ann_recall_eval" -> "IVF vs exact top-k set intersection")

  private def rows(df: DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).toSeq).toSeq.sortBy(_.mkString(""))
  }

  test("battery slice is invariant to shuffle partitioning and AQE") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    alt.conf.set("spark.sql.adaptive.enabled", "false")
    val queries = SparkEntry.queries
    sample.foreach { case (name, why) =>
      val base = rows(queries(name)(spark, sf))
      val other = rows(queries(name)(alt, sf))
      assert(base == other,
        s"$name ($why) differs across partitionings: " +
          s"${base.size} vs ${other.size} rows; first diff ${
            base.zip(other).find { case (a, b) => a != b }}")
    }
  }
}
