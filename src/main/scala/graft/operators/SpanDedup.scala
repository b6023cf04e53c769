package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-span analysis — the exact-substring face of
  * dedup (Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022: repeated n-token spans across documents are the
  * memorization-driving duplication that whole-doc dedup misses).
  * [[graft.operators.Dedup]] answers "which DOCUMENTS are near-copies";
  * this answers "how much of EACH document is copied text", the signal a
  * curation pipeline thresholds on, plus the source-pair overlap matrix a
  * corpus audit reports.
  *
  * Spans are word n-grams under the chained-xxhash64 scheme of
  * [[Fingerprint.explodedShingleHashOccurrences]] (full 64 bits per
  * position — see the collision note there); oracles count the n-gram
  * STRINGS, the same counts-equivalence the dedup battery pins.
  *
  * 100 TB shapes: one combinable aggregate keyed (doc, shingle), one
  * keyed (shingle) — both map-side partial; the join back is a shuffle
  * equi-join on the shingle key. Nothing is ever keyed by a corpus-sized
  * singleton, and no posting list materializes: doc counts per shingle
  * fold to a single long, so even a boilerplate span in a billion
  * documents costs one row.
  */
object SpanDedup {

  /** Per-document duplicated-span profile over word `n`-grams:
    * `total_spans` (all positions), `dup_spans` (positions whose n-gram
    * occurs in ≥2 distinct docs), `dup_shingles` (distinct such
    * n-grams), and `dup_span_ratio` = dup_spans/total_spans — one IEEE
    * double division of exact integer counts. Documents shorter than
    * `n` tokens emit no row (no spans exist). */
  def dupSpans(df: DataFrame, idCol: String, text: Column,
               n: Int): DataFrame = {
    val perDoc = Fingerprint
      .explodedShingleHashOccurrences(df, idCol, text, n)
      .groupBy(idCol, "sh").agg(count(lit(1)).as("__c"))
    // rows of perDoc are unique per (doc, shingle): COUNT(*) per
    // shingle IS its distinct-document frequency
    val docFreq = perDoc.groupBy("sh").agg(count(lit(1)).as("__nd"))
    // the shingle-frequency side is corpus-sized (distinct n-grams grow
    // with the corpus): pin a shuffle hash join, same as Dedup's postings
    perDoc.join(docFreq.hint("shuffle_hash"), Seq("sh"))
      .groupBy(idCol)
      .agg(
        sum(col("__c")).as("total_spans"),
        coalesce(sum(when(col("__nd") >= 2, col("__c"))), lit(0L))
          .as("dup_spans"),
        count(when(col("__nd") >= 2, lit(1))).as("dup_shingles"))
      .withColumn("dup_span_ratio",
        col("dup_spans").cast("double") / col("total_spans").cast("double"))
  }

  /** GRADED benchmark-contamination score per document — the
    * continuous complement to the binary verdicts ([[Bloom]]
    * membership, decontaminate's anti-join): the fraction of a
    * document's DISTINCT word n-grams that also occur anywhere in the
    * benchmark corpus. Thresholding this is the standard
    * n-gram-overlap decontamination rule (the 8-gram/13-gram overlap
    * tests of public LLM eval hygiene), and the raw score feeds audit
    * dashboards where a hard drop is too blunt.
    *
    * Shapes at 100 TB: both sides fold to DISTINCT (doc, shingle) /
    * (shingle) rows first; the benchmark-side distinct n-gram set is
    * BENCHMARK-sized (an eval set, bounded by construction — ≪ corpus
    * at every scale) and BROADCASTS to the overlap join, the same
    * contract [[Decontaminate]] runs on — the corpus-side gram stream
    * then never reshuffles onto the shingle key (its only exchange is
    * its own distinct). Multiplicity is ≤ 1 per (doc, shingle) by
    * construction — no posting-list blowup, no df cap needed.
    * Documents shorter than `n` tokens emit no row (they have no
    * n-grams to test).
    * Output: (id, n_grams, n_matched, contamination) with the ratio
    * one IEEE division of exact integer counts. */
  def contaminationScore(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, text: Column,
                         n: Int): DataFrame = {
    val grams = Fingerprint
      .explodedShingleHashOccurrences(corpus, idCol, text, n)
      .select(col(idCol), col("sh")).distinct()
    val benchSet = Fingerprint
      .explodedShingleHashOccurrences(benchmark, idCol, text, n)
      .select(col("sh")).distinct()
    // r16: broadcast, not shuffle_hash — the join's small side is the
    // EVAL SET's distinct n-grams (bounded by construction), exactly
    // the relation Decontaminate already broadcasts; shuffling the
    // corpus gram stream onto the shingle key to meet it was a second
    // corpus-sized exchange for a benchmark-sized lookup (guide §3.1;
    // measured 0.78 -> 0.63 s solo at sf0.1)
    grams.join(broadcast(benchSet.withColumn("__hit", lit(1))),
      Seq("sh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("__hit")).as("n_matched"))
      .withColumn("contamination",
        col("n_matched").cast("double") / col("n_grams").cast("double"))
  }

  /** Per-document repeated-text COVERAGE over word `n`-grams — the
    * Lee et al. metric proper: the fraction of a document's tokens that
    * lie inside at least one n-gram repeated in ≥2 distinct docs.
    * [[dupSpans]] counts repeated positions; overlapping spans make
    * that an overestimate of copied TEXT, so here the duplicated
    * intervals [pos, pos+n−1] are merged (gaps-and-islands: a new
    * island starts where a position exceeds the running max interval
    * end; adjacency may split islands, which leaves the covered-token
    * SUM unchanged) and the union length is reported. Every input doc
    * emits a row (0 coverage when nothing repeats or the doc is shorter
    * than `n`). Output: (id, n_tokens, covered_tokens, coverage_ratio).
    *
    * Shapes: the positional occurrence stream folds to (doc, shingle)
    * partials for the frequency pass, joins the ≥2-doc shingle set back
    * on the shingle key (shuffle hash, corpus-sized sides), and the
    * island windows re-use the doc keying — nothing ever partitions on
    * a constant. */
  def dupCoverage(df: DataFrame, idCol: String, text: Column,
                  n: Int): DataFrame = {
    val occ = Fingerprint
      .explodedShingleHashOccurrences(df, idCol, text, n, positions = true)
    val dupSh = occ.select(col(idCol), col("sh")).distinct()
      .groupBy("sh").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2).select("sh")
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("__pos")
    val prevEnd = max(col("__pos") + lit(n - 1))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    val covered = occ.join(dupSh.hint("shuffle_hash"), Seq("sh"))
      .withColumn("__new", when(prevEnd.isNull ||
        col("__pos") > prevEnd, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(byPos))
      .groupBy(col(idCol), col("__island"))
      .agg((max(col("__pos")) - min(col("__pos")) + lit(n))
        .cast("long").as("__len"))
      .groupBy(idCol).agg(sum(col("__len")).as("covered_tokens"))
    // per-doc coverage is corpus-ROW-sized (one row per doc with any
    // repeat): the zero-fill outer join must shuffle on the doc key,
    // never broadcast
    df.select(col(idCol),
        size(TextStats.tokens(text)).cast("long").as("n_tokens"))
      .join(covered.hint("shuffle_hash"), Seq(idCol), "left")
      .withColumn("covered_tokens", coalesce(col("covered_tokens"), lit(0L)))
      .withColumn("coverage_ratio",
        col("covered_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Source-pair overlap matrix: for every pair of sources sharing at
    * least one distinct word `n`-gram, the count of shared n-grams —
    * the provenance-contamination audit (which domains/dumps carry the
    * same boilerplate or syndicated text). Shingling is per DOCUMENT
    * (`idCol` — positions never cross doc boundaries), then collapsed
    * to the distinct (source, shingle) set.
    *
    * `maxSourcesPerShingle` > 0 drops shingles present in more than
    * that many sources before pairing — a shingle in k sources emits
    * k(k−1)/2 pair rows, so universal boilerplate would otherwise
    * quadratically dominate the join output at a million-domain scale
    * (the same hot-key cap [[Dedup]] applies to document frequency).
    * 0 disables the cap (the oracle-checked form at test scale). */
  def sourceOverlap(df: DataFrame, idCol: String, sourceCol: String,
                    text: Column, n: Int,
                    maxSourcesPerShingle: Int = 0): DataFrame = {
    // source rides the doc-keyed shingle shuffle as a carried column —
    // a join back on doc_id would re-shuffle the corpus (and AQE would
    // try to broadcast a corpus-sized side at small scale)
    val bySource = Fingerprint
      .explodedShingleHashOccurrences(df, idCol, text, n,
        carry = Seq(sourceCol))
      .select(col(sourceCol).as("__src"), col("sh")).distinct()
    val capped =
      if (maxSourcesPerShingle <= 0) bySource
      else {
        val nSrc = bySource.groupBy("sh")
          .agg(count(lit(1)).as("__nsrc"))
          .filter(col("__nsrc") <= maxSourcesPerShingle)
        bySource.join(nSrc.select("sh"), "sh")
      }
    val a = capped.select(col("__src").as("source_a"), col("sh"))
    val b = capped.select(col("__src").as("source_b"), col("sh"))
    // rows are distinct per (source, shingle), so each shared shingle
    // contributes exactly one row per unordered source pair; both sides
    // are the same corpus-sized set — never broadcast either
    a.join(b.hint("shuffle_hash"), Seq("sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_shingles"))
  }
}
