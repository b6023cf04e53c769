package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text statistics for training-data pipelines (north-star scope,
  * SURVEY §7.6): token counting, quality signals, language ID inputs.
  *
  * Everything is built from codegen'd primitives — `functions._`
  * (split / size / length / regexp) plus the native
  * [[graft.functions.ArrayCountInSetExpr]] for set-membership counts —
  * no UDFs and no interpreted higher-order lambdas, so the whole block
  * stays inside WholeStageCodegen and scales linearly with bytes
  * scanned. All ratios are exact-int divisions (deterministic across
  * engines).
  */
object TextStats {
  /** Whitespace tokenization after lowercase+trim (the cross-engine-
    * reproducible baseline; a BPE estimate is layered on top).
    *
    * The split class is an EXPLICIT `[ \t\n\r]+`, not `\s+`: Java's
    * `\s` is ASCII-only while other engines' regex libraries (RE2,
    * and Unicode-aware builds of them) disagree on `\s` membership —
    * an oracle comparison that hinges on `\s` is regex-library-
    * version-sensitive. A literal character class means every engine
    * tokenizes bit-identically. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "[ \\t\\n\\r]+")

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Adds `n_tokens, n_chars_calc, n_stopwords, stopword_ratio,
    * space_ratio, est_bpe_tokens` columns. */
  def apply(df: DataFrame, text: Column,
            stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val t = tokens(text)
    df.withColumn("__toks", t)
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_chars_calc", length(text).cast("long"))
      // codegen membership count, not filter(lambda) — see
      // ArrayCountInSetExpr for why the higher-order form is off-limits
      // on the per-document hot path
      .withColumn("n_stopwords",
        graft.functions.TextFunctions.countInSet(col("__toks"), stopwords))
      .withColumn("stopword_ratio", col("n_stopwords") / col("n_tokens"))
      .withColumn("space_ratio",
        (length(text) - length(regexp_replace(text, " ", ""))) / length(text))
      // ~4 chars/token is the classic BPE rule of thumb; deterministic.
      .withColumn("est_bpe_tokens", ceil(length(text) / lit(4.0)).cast("long"))
      .drop("__toks")
  }

  /** GPT-2-style PRE-tokenizer segment pattern (public knowledge; the
    * byte-pair merges then only ever split WITHIN these segments, so
    * the segment count is a true lower bound and a far better token
    * estimate than chars/4). Two changes make it engine-identical:
    * the original's trailing-space lookahead is dropped (RE2 has no
    * lookahead), and whitespace is an EXPLICIT class — Java's `\s`
    * includes U+000B (vertical tab) while RE2's does not, so `\s`
    * would silently diverge on any text containing a VT. */
  val bpeSegmentPattern: String = {
    val ws = " \\t\\n\\x0B\\f\\r" // Java's exact \s set, spelled out
    s"'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^$ws\\p{L}\\p{N}]+|[$ws]+"
  }

  /** Count of BPE pre-tokenizer segments (codegen regexp, no UDF). */
  def bpeSegments(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeSegmentPattern), lit(0)))
      .cast("long")
}
