package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the test-set-leak removal every
  * pretraining pipeline runs before training: a corpus document is
  * contaminated iff it shares at least one distinct word n-gram with any
  * document of a held-out benchmark/eval set (the n-gram-overlap rule
  * the published pretraining recipes use; n = 8..13 typical).
  *
  * Scale shape: benchmark suites are KBs-to-MBs while the corpus is TBs,
  * so the DISTINCT benchmark shingle set is broadcast and the corpus
  * side joins map-side — the corpus never shuffles for the overlap
  * test; the only corpus-keyed aggregate is the per-doc overlap count.
  * Shingles ride the same xxhash64 window construction the dedup family
  * uses ([[Fingerprint.explodedShingleHashes]]): the join compares
  * 64-bit hashes, not strings, and only per-doc distinct COUNTS are
  * emitted, which is what makes the result engine-comparable.
  */
object Decontaminate {

  /** One row per corpus doc: (id, n_overlap, keep). Docs with no
    * shingles (shorter than n tokens) carry n_overlap = 0 — a doc too
    * short to form one n-gram cannot leak one. */
  def flag(corpus: DataFrame, benchmark: DataFrame, idCol: String,
           text: Column, n: Int = 8): DataFrame = {
    val corpusSh = Fingerprint.explodedShingleHashes(corpus, idCol, text, n)
    val benchSh = Fingerprint
      .explodedShingleHashes(benchmark, idCol, text, n)
      .select(col("sh")).distinct()
    val overlap = corpusSh.join(broadcast(benchSh), Seq("sh"))
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .na.fill(0L, Seq("n_overlap"))
      .withColumn("keep", col("n_overlap") === 0L)
  }
}
