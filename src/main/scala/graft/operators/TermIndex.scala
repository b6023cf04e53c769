package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus term statistics and retrieval-index construction — the
  * term-level curation layer of a training-data pipeline (the reference's
  * profiling idiom, `vector_facts` at
  * /root/reference/pipelines/tiger/county.yml:36-41, applied to token
  * space): distinctive-term extraction for topic tagging, corpus-frequency
  * scoring for rare-token quality gates, and an inverted shingle index for
  * corpus search / attribution lookups.
  *
  * Everything here is rational-arithmetic only (integer counts + one IEEE
  * double division, which is correctly rounded in every engine) — no
  * `ln()`-based idf, whose last-ulp behavior differs between libm and the
  * JVM and would break cross-engine bit-equality. `tf/df` ranks term
  * distinctiveness identically to tf·idf for any fixed corpus size (idf is
  * monotone decreasing in df).
  *
  * 100 TB shapes: the exploded token stream folds through ONE map-side
  * combinable aggregate keyed (doc, term) before anything else touches it;
  * the per-term tables (df, cf) are vocabulary-sized — sublinear in corpus
  * size — and join back on the term key (AQE picks broadcast when the
  * vocabulary is small enough); the final per-document fold re-keys by doc.
  * No step holds a document's full term set in a single row.
  */
object TermIndex {

  /** One row per (id, term) with its in-document occurrence count —
    * the shared base relation (one explode, one combinable aggregate). */
  def termFrequencies(df: DataFrame, idCol: String, text: Column): DataFrame =
    // Spread.up: tokenize+explode+partial-agg is the kernel stage; a
    // one-split scan runs it single-threaded (guide §2.5). Hash on id
    // — the (id, term) aggregate's partials re-shuffle either way.
    Spread.up(df.select(col(idCol), text.as("__t")), col(idCol))
      .select(col(idCol), explode(TextStats.tokens(col("__t"))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))

  /** Top-`k` most distinctive terms per document, ranked by tf/df
    * (ties broken lexicographically by term — a total order per doc, so
    * the cut is deterministic under any partitioning).
    * Output: (id, term, tf, df, weight, rank). */
  def tfidfTopK(df: DataFrame, idCol: String, text: Column,
                k: Int): DataFrame = {
    val tf = termFrequencies(df, idCol, text)
    // rows of `tf` are unique per (doc, term), so COUNT(*) per term IS
    // the document frequency — no second distinct pass
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy(col("weight").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("weight",
        col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("weight"), col("rank"))
  }

  /** Sparse TF-IDF document-document cosine similarity — the inverted-
    * index twin of the dense-embedding cosine battery
    * ([[Similarity]]): candidate pairs come from the POSTINGS self-join
    * (only documents sharing a term ever meet — no all-pairs), with a
    * document-frequency cap on hot terms bounding the per-term fanout
    * (the [[Dedup]] shingle-cap pattern: a term in >maxDf docs carries
    * ~no signal and would otherwise dominate the shuffle quadratically).
    * Weights stay rational (tf/df — the file-header rule: no libm
    * `ln()` idf), squared/cross products fold through decimal-exact
    * sums ([[graft.functions.Exact]]), and the final cosine is a fixed
    * IEEE chain (sqrt of an exact sum, one multiply, one divide) — so
    * the pair set at any threshold is bit-stable across engines and
    * partitionings. Norms are computed over the SAME capped postings
    * the dot products use, keeping the metric internally consistent.
    *
    * The term unit is the CALLER's choice via the occurrence stream —
    * word shingles, not unigrams, for natural-language near-dup work:
    * a corpus drawn from a small vocabulary makes every unigram a hot
    * term (measured on the sf0.1 fixture: 31 distinct tokens, median
    * df 77% of docs — the cap correctly kills them all and the result
    * degenerates to empty), while n-gram shingles stay sparse (27k
    * distinct at the same SF, max df 25).
    *
    * @param occurrences one row per term OCCURRENCE: (id, term)
    * @return (doc_a, doc_b, cosine), doc_a < doc_b, cosine ≥ minCosine */
  def cosinePairs(occurrences: DataFrame,
                  minCosine: Double, maxDf: Long = 100): DataFrame = {
    import graft.functions.Exact
    val idCol = "id"
    val tf = occurrences.groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val postings = tf.join(dfreq.filter(col("df") <= maxDf), "term")
      .withColumn("w", col("tf").cast("double") / col("df").cast("double"))
      .select(col("term"), col(idCol).as("id"), col("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = postings.groupBy("id")
      .agg(sqrt(Exact.dsum(col("w") * col("w"))).as("nrm"))
    // both posting sides are corpus-sized: SHUFFLE_HASH, never a
    // broadcast (the Dedup.jaccard discipline, pinned in PlanShapeSpec)
    val dots = postings.select(col("term"), col("id").as("doc_a"),
        col("w").as("wa"))
      .join(postings.select(col("term"), col("id").as("doc_b"),
        col("w").as("wb")).hint("shuffle_hash"), "term")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(Exact.dsum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("id").as("doc_a"), col("nrm").as("__na")),
        "doc_a")
      .join(norms.select(col("id").as("doc_b"), col("nrm").as("__nb")),
        "doc_b")
      .withColumn("cosine", col("dot") / (col("__na") * col("__nb")))
      .filter(col("cosine") >= minCosine)
      .select("doc_a", "doc_b", "cosine")
  }

  /** Distinctive-term co-occurrence mining (the market-basket shape
    * over documents): pairs of terms that appear together in a
    * document's top-`k` tf/df-distinctive set ([[tfidfTopK]]), with
    * support count and lift. The naive form — all token pairs per
    * document — is quadratic in document length and degenerates on any
    * corpus with hot terms; restricting the basket to each document's
    * top-`k` DISTINCTIVE terms bounds the per-document fanout at
    * C(k,2) BY CONSTRUCTION (not by a tunable cap), which is the shape
    * that survives 100 TB: the pair stream is ≤ C(k,2)·|docs| rows
    * folding through one combinable count aggregate, and the per-term
    * basket-frequency table it joins is vocabulary-sized.
    *
    * Lift = P(a,b)/(P(a)P(b)) is computed as the ratio of two EXACT
    * integer products, `(n_ab·N) / (n_a·n_b)`, in one IEEE double
    * division (correctly rounded in every engine — the file-header
    * no-`ln()` rule; log-lift would rank identically anyway, log being
    * monotone). N is the corpus document count, folded in as a 1-row
    * broadcast (the [[Bm25]] crossJoin pattern — no driver collect).
    *
    * Output: (term_a, term_b, n_ab, lift), term_a < term_b,
    * n_ab ≥ `minSupport`. */
  def topicCooccurrence(df: DataFrame, idCol: String, text: Column,
                        k: Int, minSupport: Long): DataFrame = {
    // three consumers (self-join sides + basket frequencies) — persist
    // the basket relation so the tf window runs once (the shared-
    // subplan idiom; Spark's cache manager plan-matches the copies)
    val basket = tfidfTopK(df, idCol, text, k)
      .select(col(idCol).as("id"), col("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = basket.groupBy("term").agg(count(lit(1)).as("n"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val pairs = basket.select(col("id"), col("term").as("term_a"))
      .join(basket.select(col("id"), col("term").as("term_b")), "id")
      .filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(bf.select(col("term").as("term_a"), col("n").as("__na")),
        "term_a")
      .join(bf.select(col("term").as("term_b"), col("n").as("__nb")),
        "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        ((col("n_ab") * col("n_docs")).cast("double") /
          (col("__na") * col("__nb")).cast("double")).as("lift"))
  }

  /** Per-document corpus-frequency profile — the rare-token quality
    * signal (a doc whose tokens are all corpus-rare is likely noise;
    * all corpus-common, likely boilerplate): token-weighted mean and
    * extremes of each token's corpus-wide occurrence count `cf`.
    * `mean_cf` = Σ(tf·cf)/Σtf as one double division of exact integer
    * sums. Output: (id, n_tokens, n_distinct_terms, min_cf, max_cf,
    * mean_cf). */
  def rarity(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val tf = termFrequencies(df, idCol, text)
    val cf = tf.groupBy("term").agg(sum(col("tf")).as("cf"))
    tf.join(cf, "term")
      .groupBy(idCol)
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct_terms"),
        min(col("cf")).as("min_cf"),
        max(col("cf")).as("max_cf"),
        // Σ(tf·cf) stays well under 2^53 for any realistic shard (tf·cf
        // per term ≤ doc_len × corpus token count of ONE term); the
        // division is the only float op, bit-identical across engines
        (sum(col("tf") * col("cf")).cast("double") /
          sum(col("tf")).cast("double")).as("mean_cf"))
  }

  /** Inverted word-n-gram index: one row per distinct shingle with its
    * document frequency and the first `maxPostings` doc ids (ascending) —
    * the corpus-search/attribution structure, with posting lists capped so
    * a boilerplate shingle present in half the corpus cannot materialize
    * an unbounded array in one row. Postings are emitted as a
    * comma-joined string (numeric sort BEFORE stringify). */
  def invertedIndex(df: DataFrame, idCol: String, text: Column,
                    n: Int, maxPostings: Int): DataFrame =
    Fingerprint.explodedShingles(df, idCol, text, n)
      .select(col(idCol).as("__id"), col("sh").as("shingle")).distinct()
      .groupBy("shingle")
      .agg(
        count(lit(1)).as("df"),
        array_join(
          transform(
            slice(array_sort(collect_list(col("__id"))), 1, maxPostings),
            _.cast("string")),
          ",").as("postings"))
}
