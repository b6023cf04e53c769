package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** Bigram language-model quality scoring (north-star scope, SURVEY
  * §7.6: "quality scoring" for training-data curation) — the KenLM-style
  * corpus-fit signal: train token statistics on a held-in reference
  * slice, score every other document by how predictable its bigrams are
  * under that model.
  *
  * Cross-engine exactness dictates the score's FORM. True perplexity is
  * exp(−mean ln p̂), but `ln`/`exp` are libm calls that differ by ulps
  * between the JVM and DuckDB — enough to break the driver's
  * hash-equality gate. So the emitted score is the RATIONAL equivalent
  * signal: the mean inverse smoothed conditional probability
  * ("branching factor", mean of 1/p̂(w2|w1) under add-one smoothing).
  * Each addend is one IEEE division of two exact integers (correctly
  * rounded in both engines); the mean is a decimal-exact sum
  * ([[Exact.davg]]). Monotonicity in each addend means filter
  * thresholds translate directly; a user who wants log-space perplexity
  * applies ln on top of their own engine.
  *
  * Scale shape: train-side counts are two hash aggregates (map-side
  * partial combine); scoring is two shuffle-hash joins keyed by bigram
  * string / unigram string — postings-style equi-joins that partition
  * across executors like the dedup battery's shingle joins. The vocab
  * size rides along as a broadcast 1-row frame; nothing iterates on the
  * driver.
  */
object NgramLm {

  /** One row per (id, sh, w1): positional bigram postings. Reuses the
    * shared shingle builder ([[Fingerprint.explodedShingles]], the
    * lead-window form — codegen, no interpreted higher-order lambdas)
    * so bigram semantics can't drift from the dedup battery's. Tokens
    * are whitespace-split, so the first token of the 2-gram string is
    * recoverable with a codegen `substring_index`. */
  private def bigramPostings(df: DataFrame, idCol: String,
                             text: Column): DataFrame =
    Fingerprint.explodedShingles(df, idCol, text, 2)
      .withColumn("w1", substring_index(col("sh"), " ", 1))

  /** Score `docs` under a bigram LM trained on `lmDocs`.
    *
    * Per scored document: `n_bigrams` (occurrences, not distinct —
    * LM scoring weights every token transition), `n_oov` (bigrams never
    * seen in training), `oov_rate` (their share; null when the doc has
    * no bigrams), and `branching` = decimal-exact mean over bigram
    * occurrences of (c_train(w1) + V) / (c_train(w1 w2) + 1) — the
    * inverse add-one-smoothed conditional probability, V = training
    * vocabulary size. Higher = less predictable under the reference
    * slice (more novel or lower quality).
    */
  def score(docs: DataFrame, lmDocs: DataFrame, idCol: String,
            text: Column): DataFrame = {
    val uni = lmDocs
      .select(explode(graft.operators.TextStats.tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    // vocab size as a 1-row subplan (broadcast below) — an agg column,
    // not a collected scalar, so the whole score stays one lazy plan
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = bigramPostings(lmDocs, idCol, text)
      .groupBy("sh").agg(count(lit(1)).as("cb"))
    val sb = bigramPostings(docs, idCol, text)
    val scored = sb
      .join(bi.hint("shuffle_hash"), Seq("sh"), "left")
      .join(uni.hint("shuffle_hash").withColumnRenamed("w", "w1"),
        Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      // exact longs in, one correctly-rounded IEEE division out
      .withColumn("inv",
        (coalesce(col("cu"), lit(0L)) + col("v")) /
          (coalesce(col("cb"), lit(0L)) + lit(1L)))
      .withColumn("oov", when(col("cb").isNull, lit(1L)).otherwise(lit(0L)))
    val agg = scored.groupBy(idCol).agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("oov")).as("n_oov"),
      Exact.davg(col("inv")).as("branching"))
    // every requested doc appears, including bigram-free ones
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(col("n_bigrams") > 0, col("n_oov") / col("n_bigrams"))
          .as("oov_rate"),
        col("branching"))
  }
}
