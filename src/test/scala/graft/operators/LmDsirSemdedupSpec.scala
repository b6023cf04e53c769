package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Semantics of the round-6 curation scorers: bigram-LM corpus fit
  * ([[NgramLm]]), DSIR importance weighting ([[Dsir]]), and SemDeDup
  * cluster-blocked semantic dedup ([[SemanticDedup]]). Bit-level
  * cross-engine equality is the driver oracle's job; these pin the
  * hand-checkable small-corpus behavior.
  */
class LmDsirSemdedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("NgramLm.score: in-domain text scores lower branching than novel text") {
    val train = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "the cat sat on the rug"),
      (12L, "the dog sat on the mat")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"), // every bigram seen in training
      (2L, "quantum flux capacitor engaged warp drive"), // all OOV
      (3L, "hi")) // single token: no bigrams
      .toDF("doc_id", "text")
    val out = NgramLm.score(docs, train, "doc_id", col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1).getAs[Long]("n_oov") == 0L)
    assert(out(2).getAs[Long]("n_oov") == out(2).getAs[Long]("n_bigrams"))
    assert(out(1).getAs[Double]("branching") <
      out(2).getAs[Double]("branching"))
    // bigram-free doc still reported, with null rates
    assert(out(3).getAs[Long]("n_bigrams") == 0L)
    assert(out(3).isNullAt(out(3).fieldIndex("oov_rate")))
    assert(out(3).isNullAt(out(3).fieldIndex("branching")))
    // smoothed inverse probability: every addend ≥ 1, so the mean is too
    assert(out(1).getAs[Double]("branching") >= 1.0)
  }

  test("NgramLm.score: NULL-text and empty-text docs keep their output row") {
    val train = Seq((10L, "a b"), (11L, "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),    // one trained bigram
      (2L, null),     // NULL text: scored side coalesces to ''
      (3L, ""))       // empty text: single empty token, no bigrams
      .toDF("doc_id", "text")
    val out = NgramLm.score(docs, train, "doc_id", col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    for (id <- Seq(2L, 3L)) {
      assert(out(id).getAs[Long]("n_bigrams") == 0L)
      assert(out(id).getAs[Long]("n_oov") == 0L)
      assert(out(id).isNullAt(out(id).fieldIndex("oov_rate")))
      assert(out(id).isNullAt(out(id).fieldIndex("branching")))
    }
    assert(out(1).getAs[Long]("n_bigrams") == 1L)
    assert(out(1).getAs[Long]("n_oov") == 0L)
  }

  test("Dsir.weights: target-like docs carry higher mean importance ratio") {
    // two disjoint vocabularies; target = the "good" one
    val good = (0 until 6).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta"))
    val bad = (6 until 12).map(i =>
      (i.toLong, "junk spam noise garbage filler padding"))
    val docs = (good ++ bad).toDF("doc_id", "text")
    val target = good.toDF("doc_id", "text")
    val out = Dsir.weights(docs, target, "doc_id", col("text"), b = 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_ratio")).toMap
    val g = (0 until 6).map(i => out(i.toLong)).min
    val b = (6 until 12).map(i => out(i.toLong)).max
    assert(g > b, s"target-vocab min $g should exceed raw-vocab max $b")
    assert(b < 1.0 && g > 1.0)
  }

  test("SemanticDedup.kForCorpus: constant expected cluster size, " +
      "MaxK-capped") {
    // k grows with n so |cluster| ≈ target stays constant — the rule
    // that keeps within-cluster pair work LINEAR in the corpus
    assert(SemanticDedup.kForCorpus(1024, 1024) == 1)
    assert(SemanticDedup.kForCorpus(1025, 1024) == 2)
    assert(SemanticDedup.kForCorpus(1024 * 1000, 1024) == 1000)
    assert(SemanticDedup.kForCorpus(0, 1024) == 1)
    assert(SemanticDedup.kForCorpus(Long.MaxValue, 1024) ==
      graft.operators.Ivf.MaxK)
  }

  test("SemanticDedup.dedupe: same-cluster near-dups collapse to the min id") {
    // two tight clusters on orthogonal axes plus one lone vector;
    // within each cluster all pairs are near-identical (cosine ≈ 1)
    val vecs = Seq(
      (1L, Seq(1.0, 0.01, 0.0, 0.0)),
      (2L, Seq(1.0, 0.02, 0.0, 0.0)),
      (3L, Seq(1.0, 0.00, 0.01, 0.0)),
      (4L, Seq(0.0, 0.01, 1.0, 0.0)),
      (5L, Seq(0.0, 0.02, 1.0, 0.0)),
      (6L, Seq(0.0, 0.0, 0.0, 1.0)))
      .toDF("id", "vec")
    val out = SemanticDedup.dedupe(vecs, k = 3, iters = 2, minCosine = 0.9)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out.size == 6)
    // min id of each tight cluster survives; the rest point at it
    assert(out(1).getAs[Boolean]("keep"))
    assert(!out(2).getAs[Boolean]("keep") &&
      out(2).getAs[Long]("killer_id") == 1L)
    assert(!out(3).getAs[Boolean]("keep") &&
      out(3).getAs[Long]("killer_id") == 1L)
    assert(out(4).getAs[Boolean]("keep"))
    assert(!out(5).getAs[Boolean]("keep") &&
      out(5).getAs[Long]("killer_id") == 4L)
    assert(out(6).getAs[Boolean]("keep"))
    // killed rows never appear as nulls — full-corpus verdict table
    assert(out.values.forall(r => !r.isNullAt(r.fieldIndex("cluster_id"))))
  }
}
