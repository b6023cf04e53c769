package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document fingerprinting (north-star scope, SURVEY §7.6).
  *
  * [[bagFingerprint]] is the key-collapsing fingerprint: lowercase →
  * tokenize → distinct → sort → md5, so any two documents with the same
  * word SET collapse to one key regardless of order/repetition. md5 over
  * UTF-8 bytes is identical in every engine → oracle-checkable.
  *
  * [[shingles]] produces word n-grams (the MinHash/Jaccard input).
  * Implemented with `transform(sequence(...), slice(...))` — array
  * expressions inside codegen, no explode, no UDF.
  */
object Fingerprint {
  /** md5 of the sorted distinct token bag. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextStats.tokens(text)))))

  /** Word n-gram shingles of a token array (empty when too short). */
  def shinglesOf(toks: Column, n: Int): Column = {
    val t = toks
    when(size(t) >= n,
      expr(s"transform(sequence(1, size(__sh_toks) - ${n - 1}), " +
        s"i -> array_join(slice(__sh_toks, i, $n), ' '))"))
      .otherwise(array())
  }

  /** Convenience: text → distinct word n-gram shingles.
    * NOTE: callers must alias a token column `__sh_toks` first; use
    * [[withShingles]] for the common case. */
  def withShingles(df: org.apache.spark.sql.DataFrame, text: Column, n: Int,
                   outCol: String = "shingles"): org.apache.spark.sql.DataFrame =
    df.withColumn("__sh_toks", TextStats.tokens(text))
      .withColumn(outCol, array_distinct(shinglesOf(col("__sh_toks"), n)))
      .drop("__sh_toks")
}
