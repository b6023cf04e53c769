package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published Gopher / MassiveText document-quality rule battery
  * (Rae et al. 2021, appendix A.1.1 — public knowledge), re-expressed
  * as codegen'd column programs: word-count bounds, mean-word-length
  * band, symbol-to-word ratio (`#` and `...`), bullet-started and
  * ellipsis-ended line fractions, alphabetic-word fraction, and a
  * distinct-stop-word floor. Complements [[TextStats]]' stopword /
  * space ratios (the C4-ish battery) with the rules large corpus
  * cleans actually ship.
  *
  * Scale shape: one stateless projection battery per document — no
  * shuffle, no UDF, no interpreted higher-order function; every count
  * is a `regexp_count` / `length`-difference / `array_contains` form
  * that stays inside WholeStageCodegen, so the operator is a linear
  * scan at any corpus size and partitioning is inherited from the
  * source.
  *
  * Cross-engine parity rules (the oracle runs in DuckDB):
  *  - whitespace is always the EXPLICIT class `[ \t\n\r]+` (the
  *    engine-version-proof tokenization rule from [[TextStats]]);
  *  - line predicates avoid `(?m)` anchors entirely — Java's
  *    MULTILINE `$` also matches before `\r` and U+2028 while RE2's
  *    only matches before `\n`, so "line start" is spelled
  *    `(^|\n)` and "line ends with ..." is spelled `...\n` plus an
  *    end-of-string suffix check;
  *  - every ratio is the SAME int-over-int double division on both
  *    sides, so the doubles are bit-identical.
  */
object GopherRules {
  /** Gopher's symbol set for the symbol-to-word rule. */
  private val hashChar = "#"
  private val ellipsis = "\\.\\.\\."

  private val ws = " \\t\\n\\r"

  /** Count of lines starting with a bullet (`-`, `*`, `•`) after
    * optional indent. `(^|\n)` not `(?m)^` — see class doc. */
  def bulletLines(text: Column): Column =
    regexp_count(text, lit(s"(?:^|\\n)[ \\t]*[-*\\u2022]")).cast("long")

  /** Count of lines ending in `...`: embedded `...\n` occurrences
    * plus an end-of-string suffix test. `...\r\n` is deliberately NOT
    * a match on either engine. */
  def ellipsisLines(text: Column): Column =
    (regexp_count(text, lit(s"$ellipsis\\n")) +
      when(text.endsWith("..."), 1).otherwise(0)).cast("long")

  /** Count of whitespace-delimited words containing at least one
    * ASCII letter; evaluated against trim(lower(text)) so `[a-z]`
    * suffices. The boundary `(^|[ws])` is consumed by the match, so a
    * word can never double-count. */
  def alphaWords(lowered: Column): Column =
    regexp_count(lowered, lit(s"(?:^|[$ws])[^$ws]*[a-z]")).cast("long")

  /** How many DISTINCT members of the Gopher stop set appear. */
  val stopSet: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def distinctStops(toks: Column): Column =
    stopSet.map(s => array_contains(toks, s).cast("int"))
      .reduce(_ + _)

  /** Full battery over `text`; adds the metric columns and a
    * first-failing-rule `verdict` (Gopher order: length bounds, word
    * shape, symbols, layout, alpha, stop words). Thresholds default to
    * the published values. */
  def apply(df: DataFrame, text: Column,
            minWords: Long = 50, maxWords: Long = 100000,
            minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
            maxSymbolRatio: Double = 0.1,
            maxBulletRatio: Double = 0.9, maxEllipsisRatio: Double = 0.3,
            minAlphaRatio: Double = 0.8, minStopDistinct: Int = 2)
  : DataFrame = {
    val lowered = trim(lower(text))
    df
      .withColumn("__toks", TextStats.tokens(text))
      .withColumn("n_words", size(col("__toks")).cast("long"))
      // sum of token lengths without a higher-order sum: strip the
      // whitespace runs and measure what is left
      .withColumn("__word_chars",
        length(regexp_replace(trim(text), lit(s"[$ws]+"), lit("")))
          .cast("long"))
      .withColumn("mean_word_len",
        col("__word_chars").cast("double") / col("n_words").cast("double"))
      .withColumn("__n_symbols",
        (length(text) - length(regexp_replace(text, lit(hashChar), lit(""))) +
          regexp_count(text, lit(ellipsis))).cast("long"))
      .withColumn("symbol_word_ratio",
        col("__n_symbols").cast("double") / col("n_words").cast("double"))
      .withColumn("n_lines",
        size(split(text, "\n", -1)).cast("long"))
      .withColumn("bullet_line_ratio",
        bulletLines(text).cast("double") / col("n_lines").cast("double"))
      .withColumn("ellipsis_line_ratio",
        ellipsisLines(text).cast("double") / col("n_lines").cast("double"))
      .withColumn("alpha_word_ratio",
        alphaWords(lowered).cast("double") / col("n_words").cast("double"))
      .withColumn("n_stop_distinct", distinctStops(col("__toks")))
      .withColumn("verdict",
        when(col("n_words") < minWords, "too_few_words")
          .when(col("n_words") > maxWords, "too_many_words")
          .when(col("mean_word_len") < minMeanWordLen, "short_words")
          .when(col("mean_word_len") > maxMeanWordLen, "long_words")
          .when(col("symbol_word_ratio") > maxSymbolRatio, "symbol_heavy")
          .when(col("bullet_line_ratio") > maxBulletRatio, "bullet_heavy")
          .when(col("ellipsis_line_ratio") > maxEllipsisRatio,
            "ellipsis_heavy")
          .when(col("alpha_word_ratio") < minAlphaRatio, "non_alpha")
          .when(col("n_stop_distinct") < minStopDistinct, "no_stopwords")
          .otherwise("keep"))
      .drop("__toks", "__word_chars", "__n_symbols")
  }
}
