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

  /** One row per (id, `__pos`, `sh`): POSITIONAL word n-gram string
    * shingles via lead-window concat (codegen; trailing positions
    * lacking a full window are dropped) — the shared builder behind
    * winnowing, repetition detection and the md5 minhash variant, so
    * shingle semantics can never drift between them. */
  def explodedShingles(df: org.apache.spark.sql.DataFrame,
                       idCol: String, text: Column, n: Int)
  : org.apache.spark.sql.DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
    val parts = col("__tok") +:
      (1 until n).map(j => lead(col("__tok"), j).over(byPos))
    // Spread.up BEFORE the explode (guide §2.3/§2.4): the id-hash
    // exchange this window needs anyway moves WHOLE DOCS here instead
    // of exploded per-token rows (strictly fewer bytes), and the
    // tokenize+explode kernel parallelizes past a one-split scan —
    // the window's ClusteredDistribution(id) is satisfied by the
    // repartition, so no second exchange appears.
    Spread.up(df.select(col(idCol), text.as("__sh_text")), col(idCol))
      .select(col(idCol),
        posexplode(TextStats.tokens(col("__sh_text")))
          .as(Seq("__pos", "__tok")))
      .withColumn("sh",
        when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("sh").isNotNull)
      .select(col(idCol), col("__pos"), col("sh"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
    * MOSS rolling-hash scheme): hash every word n-gram, slide a window
    * of `w` consecutive shingle hashes over the document, keep each
    * window's MINIMUM hash; the distinct kept values are the
    * fingerprint set. Guarantees: any shared run of ≥ n+w-1 tokens
    * between two documents yields at least one shared fingerprint, and
    * the set is position-independent — the standard containment/overlap
    * detector (vs whole-doc equality from [[bagFingerprint]]).
    *
    * Shapes: one shuffle (by id, ordered by position) serves both the
    * shingle-building `lead` window and the winnowing ROWS frame; no
    * explode beyond tokens, all codegen. md5 keeps it oracle-checkable
    * (MIN over hex strings, bit-identical in every engine).
    *
    * Output: one row per distinct (id, `fp`).
    */
  def winnowFingerprints(df: org.apache.spark.sql.DataFrame,
                         idCol: String, text: Column,
                         n: Int = 3, w: Int = 4)
  : org.apache.spark.sql.DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
    val frame = byPos.rowsBetween(-(w - 1), 0)
    explodedShingles(df, idCol, text, n)
      .withColumn("__sh", md5(col("sh")))
      // row_number (not __pos) indexes the SHINGLE sequence so the
      // full-window filter below is robust to position gaps
      .withColumn("__i", row_number().over(byPos))
      .withColumn("fp", min(col("__sh")).over(frame))
      .filter(col("__i") >= w) // only full windows select
      .select(col(idCol), col("fp")).distinct()
  }

  /** One row per distinct (id, shingle-hash), built codegen-only:
    * posexplode tokens → xxhash64 per token → n-window combine via
    * `lead()` + per-step rehash → distinct.
    *
    * Measured at sf0.1 (5k docs, 260k shingles): ~0.6 s vs ~4 s for the
    * `transform(...)`-lambda string-shingle form and ~10 s for hashing
    * inside the lambda — higher-order functions evaluate interpreted
    * per-element, while posexplode/window/hash are all whole-stage
    * codegen. The one shuffle (by id, sort by pos) doubles as the
    * distinct's partitioning.
    *
    * The combine step is a HASH CHAIN — `acc = xxhash64(acc, next)` per
    * position — not a shifted XOR: shifting destroys the shifted-out
    * bits, so for n beyond a few tokens some positions contribute only
    * 1–2 bits and distinct n-grams collide with near-coin-flip odds (a
    * real doc-1832 8-gram false positive at sf0.1 caught it). Chained
    * rehashing keeps every position's full 64 bits in play: collision
    * odds are the generic ~d²/2⁶⁴ birthday bound, negligible for
    * near-dup semantics. xxhash64 SKIPS null inputs rather than
    * propagating them, so trailing partial windows are nulled
    * explicitly — an (n-1)-token tail must not alias a shorter gram.
    */
  def explodedShingleHashes(df: org.apache.spark.sql.DataFrame,
                            idCol: String, text: Column, n: Int)
  : org.apache.spark.sql.DataFrame =
    explodedShingleHashOccurrences(df, idCol, text, n).distinct()

  /** The NON-distinct base of [[explodedShingleHashes]]: one row per
    * shingle POSITION (id, `sh`), so downstream consumers that need
    * occurrence counts (repeated-span detection, [[SpanDedup]]) share
    * the exact hash-chain semantics of the distinct set consumers.
    * `carry` names per-document columns (constant within an id) to keep
    * on the output — threading them through here costs nothing (they
    * ride the existing doc-keyed shuffle) while joining them back on
    * doc_id later would re-shuffle the whole corpus. `positions = true`
    * additionally emits the 0-based token offset `__pos` of each
    * shingle (span-coverage consumers need it; set consumers must NOT
    * get it, or their distinct() stops deduplicating). */
  def explodedShingleHashOccurrences(df: org.apache.spark.sql.DataFrame,
                                     idCol: String, text: Column, n: Int,
                                     carry: Seq[String] = Nil,
                                     positions: Boolean = false)
  : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
    val combined = (1 until n).foldLeft(col("__h0")) { (acc, j) =>
      xxhash64(acc, lead(col("__h0"), j).over(w))
    }
    // Spread.up before the explode — same rationale as
    // [[explodedShingles]]: the doc-keyed exchange the window forces
    // anyway moves whole docs, not exploded tokens, and the tokenize/
    // hash kernel parallelizes past a one-split scan.
    Spread.up(df.select(col(idCol) +: carry.map(col) :+
        text.as("__sh_text"): _*), col(idCol))
      .select(col(idCol) +: carry.map(col) :+
        posexplode(TextStats.tokens(col("__sh_text")))
          .as(Seq("__pos", "__tok")): _*)
      .withColumn("__h0", xxhash64(col("__tok")))
      .withColumn("sh", // trailing positions lack a full window
        when(lead(col("__h0"), n - 1).over(w).isNotNull, combined))
      .filter(col("sh").isNotNull)
      .select((idCol +: carry ++: (if (positions) Seq("__pos") else Nil)
        :+ "sh").map(col): _*)
  }
}
