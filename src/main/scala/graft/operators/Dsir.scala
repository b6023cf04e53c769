package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** DSIR-style importance weighting for data selection (north-star
  * scope, SURVEY §7.6) — the hashed n-gram importance-resampling signal
  * of Xie et al., "Data Selection for Language Models via Importance
  * Resampling" (public paper): featurize every document into B hashed
  * token buckets, fit target and raw bucket distributions, and weight
  * each document by how target-like its tokens are.
  *
  * Cross-engine exactness dictates the weight's FORM (the same
  * discipline as [[NgramLm]]): the paper's log-likelihood-ratio sum is
  * `ln`-based and libm `ln` differs by ulps across engines, so the
  * emitted weight is the rational per-token likelihood ratio, averaged
  * decimal-exactly: mean over tokens of
  * ((c_target(f)+1)·(N_raw+B)) / ((c_raw(f)+1)·(N_target+B)) — add-one
  * smoothed target/raw probability ratio of the token's bucket. Each
  * addend is exact 64-bit integer products (< 2^53, exactly
  * representable) and ONE IEEE division; `n_tgt_leaning` counts tokens
  * whose bucket ratio exceeds 1 (an integer cross-check of the same
  * signal). Resampling then thresholds/samples on `mean_ratio` exactly
  * as DSIR does on the log weight (monotone per addend).
  *
  * The bucket hash is md5-prefix mod B — md5 is bit-identical in every
  * engine, making the featurization oracle-checkable (same reason the
  * MinHash oracle family is md5-based).
  *
  * Scale shape: two B-row hash aggregates for the distributions, then
  * scoring joins the exploded token stream against the B-row stats
  * frame by BROADCAST (B is a constant, default 512) — no shuffle of
  * the corpus beyond the final per-doc aggregate, which partial-
  * aggregates map-side.
  */
object Dsir {

  /** Hashed feature bucket of a token: first 6 md5 hex chars as an
    * integer, mod `b`. Codegen (`md5`/`conv` are native expressions). */
  def bucketOf(w: Column, b: Int): Column =
    (conv(substring(md5(w), 1, 6), 16, 10).cast("long") % b).cast("int")

  /** One row per (doc, token) — plus one null-token row for a doc
    * whose text tokenizes to nothing (explode_outer), so every doc
    * survives to the final aggregate without a corpus-sized back-join.
    * Consumers must count `w`, not rows. */
  private def tokenBuckets(df: DataFrame, idCol: String, text: Column,
                           b: Int): DataFrame =
    // Spread.up: tokenize + md5-bucket per token is the kernel stage —
    // single-threaded on a one-split scan otherwise (guide §2.5)
    Spread.up(df.select(col(idCol), text.as("__t")), col(idCol))
      .select(col(idCol),
        explode_outer(TextStats.tokens(col("__t"))).as("w"))
      .withColumn("f", bucketOf(col("w"), b))

  /** Importance weights for every document of `docs`, with `target` the
    * exemplar slice of the distribution to up-weight (typically a
    * high-quality subset; may overlap `docs`). Returns one row per doc:
    * (id, n_tokens, n_tgt_leaning, mean_ratio). */
  def weights(docs: DataFrame, target: DataFrame, idCol: String,
              text: Column, b: Int = 512): DataFrame = {
    val rawTok = tokenBuckets(docs, idCol, text, b)
    val tgtTok = tokenBuckets(target, idCol, text, b)
    // distributions and totals see TOKENS only (count(w) skips the
    // null placeholder rows explode_outer emits for token-free docs)
    val raw = rawTok.groupBy("f").agg(count(col("w")).as("cr"))
      .filter(col("f").isNotNull)
    val tgt = tgtTok.groupBy("f").agg(count(col("w")).as("ct"))
      .filter(col("f").isNotNull)
    // ≤ b rows after the full-outer merge; totals ride along as a 1-row
    // frame — everything below broadcasts
    val stats = raw.join(tgt, Seq("f"), "full_outer")
      .select(col("f"), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = rawTok.agg(count(col("w")).as("nr"))
      .crossJoin(tgtTok.agg(count(col("w")).as("nt")))
    val scored = rawTok
      .join(broadcast(stats), Seq("f"), "left")
      .crossJoin(broadcast(totals))
      // null for the placeholder row (w null → f null → no stats match
      // would still produce a ratio via the coalesces, so gate on w)
      .withColumn("ratio", when(col("w").isNotNull,
        ((coalesce(col("ct"), lit(0L)) + lit(1L)) * (col("nr") + lit(b.toLong))) /
          ((coalesce(col("cr"), lit(0L)) + lit(1L)) * (col("nt") + lit(b.toLong)))))
    // every requested doc appears, including token-free ones (zero
    // tokens → n_tokens 0, null mean_ratio) — the one-row-per-doc
    // contract of [[NgramLm.score]], held WITHOUT a corpus-sized
    // back-join: the placeholder row carries the doc to this aggregate
    scored.groupBy(idCol).agg(
      count(col("w")).as("n_tokens"),
      sum(when(col("ratio") > 1.0, lit(1L)).otherwise(lit(0L)))
        .as("n_tgt_leaning"),
      Exact.davg(col("ratio")).as("mean_ratio"))
      .select(col(idCol), col("n_tokens"), col("n_tgt_leaning"),
        col("mean_ratio"))
  }
}
