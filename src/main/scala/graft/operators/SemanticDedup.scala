package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (north-star scope, SURVEY
  * §7.6: embedding-cosine near-dup at corpus scale) — Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" (public paper): cluster the embedding space with
  * k-means, then prune near-duplicate pairs WITHIN clusters only, so
  * the pair search is an equi-join on cluster id instead of an O(n²)
  * corpus cross join.
  *
  * Reuses the deterministic k-means of [[Ivf]] (seeded init, fixed
  * iterations, decimal-exact centroid means — the chain the `ivf_ann`
  * oracle already pins bit-exactly against DuckDB). The keep rule is
  * the greedy min-id kill: a document is dropped iff some SAME-CLUSTER
  * document with a smaller id is within the cosine threshold; its
  * `killer_id` is the smallest such id. Non-iterative (defined purely
  * over the pair set), so it is reproducible across engines and
  * partitionings — unlike centroid-distance keeps, which tie-break on
  * ulps.
  *
  * Scale shape: the pair search is a self shuffle equi-join keyed by
  * `cluster_id` — per-cluster work is |cluster|², the SemDeDup contract
  * (k is chosen ∝ √n so clusters stay bounded); the kill aggregation is
  * one hash aggregate. Nothing driver-side beyond Ivf's constant-size
  * k-row centroid materialization.
  */
object SemanticDedup {

  /** SemDeDup's own scaling rule, as a helper so callers size k from
    * the corpus instead of pinning it: k = n / targetClusterSize keeps
    * the EXPECTED cluster size constant as the corpus grows, so the
    * within-cluster pair work is n·targetClusterSize — linear in n —
    * instead of the n²/k a fixed k degrades to. (The oracle query pins
    * k=8 for cross-engine determinism at the gate SFs; SCALE_r09's
    * semantic_dedup row measures that fixed-k form, which is why it
    * grows super-linearly there — a parameter artifact, not a plan
    * one.) Capped at [[Ivf.MaxK]]: the centroid table must stay a
    * driver-sized constant. */
  def kForCorpus(n: Long, targetClusterSize: Int = 1024): Int = {
    require(targetClusterSize >= 1)
    // overflow-safe ceil division (n can be Long.MaxValue)
    val ceil = n / targetClusterSize +
      (if (n % targetClusterSize > 0) 1L else 0L)
    math.max(1L, math.min(Ivf.MaxK.toLong, ceil)).toInt
  }

  /** @param corpus (id LONG, vec ARRAY<DOUBLE>)
    * @return one row per input id:
    *         (id, cluster_id, killer_id NULLABLE, keep BOOLEAN). */
  def dedupe(corpus: DataFrame, k: Int, iters: Int,
             minCosine: Double): DataFrame =
    dedupe(corpus, Ivf.train(corpus, k, iters), minCosine)

  /** Variant over an ALREADY-TRAINED centroid table (the index
    * lifecycle: train once, reuse — [[Ivf.train]] is deterministic, so
    * sharing centroids across consumers changes nothing). */
  def dedupe(corpus: DataFrame, centroids: DataFrame,
             minCosine: Double): DataFrame = {
    val assigned = Ivf.assign(corpus, centroids)
    val a = assigned.select(col("cluster_id"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val b = assigned.select(col("cluster_id"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    val killers = a.join(b.hint("shuffle_hash"), Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("vec_a"), col("vec_b")) >= minCosine)
      .groupBy(col("id_b").as("id"))
      .agg(min(col("id_a")).as("killer_id"))
    assigned.join(killers.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), col("cluster_id"), col("killer_id"),
        col("killer_id").isNull.as("keep"))
  }
}
