package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** BM25 ranking over the corpus (north-star scope: retrieval over
  * training data — the scorer behind corpus search, attribution
  * lookups, and hard-negative mining; Robertson & Zaragoza's public
  * formulation).
  *
  * Cross-engine exactness reshapes the idf term (the [[TermIndex]]
  * discipline): classic BM25 idf is ln((N−df+0.5)/(df+0.5)+1), but libm
  * `ln` differs by ulps across engines, so the score uses the RATIONAL
  * odds ratio (N−df+0.5)/(df+0.5) directly — ln is monotone, so
  * per-term rankings are identical; only absolute scales differ (and a
  * user may apply ln on top in their own engine). Every factor is then
  * integer-exact counts flowing through a fixed chain of IEEE ops
  * (correctly rounded, same expression tree on both sides); the k1/b
  * constants are interpolated into the oracle from the SAME Scala
  * doubles the engine uses.
  *
  * Scale shape: one exploded-token combinable aggregate (the shared
  * [[TermIndex.termFrequencies]] base), vocabulary-sized df table
  * joined back on the term key, query terms and the 1-row (N, avgdl)
  * stats broadcast; the rank window partitions by query term — no
  * global window, no corpus cross join.
  */
object Bm25 {

  /** Top-`k` documents per query term.
    * @param queryTerms single column `term`(small: broadcast onto the
    *                   postings)
    * @return (term, id, tf, df, dl, score, rank). */
  def topK(docs: DataFrame, idCol: String, text: Column,
           queryTerms: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = TermIndex.termFrequencies(docs, idCol, text)
    val dl = docs.select(col(idCol),
      size(TextStats.tokens(text)).cast("long").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"),
      Exact.davg(col("dl")).as("avgdl"))
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfPart = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("term")
      .orderBy(col("score").desc, col(idCol).asc)
    tf.join(broadcast(queryTerms), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * tfPart)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("term"), col(idCol), col("tf"), col("df"), col("dl"),
        col("score"), col("rank"))
  }

  /** The `cf`-heaviest corpus terms (total occurrences, ties by term) —
    * a deterministic self-contained query set for harness use. */
  def topTerms(docs: DataFrame, idCol: String, text: Column,
               n: Int): DataFrame =
    TermIndex.termFrequencies(docs, idCol, text)
      .groupBy("term").agg(sum("tf").as("cf"))
      .orderBy(col("cf").desc, col("term").asc).limit(n)
      .select("term")
}
