package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** TermIndex + SpanDedup unit contracts on hand-computable fixtures. */
class CorpusOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple", "s1"),
    (2L, "banana cherry", "s1"),
    (3L, "apple date date date", "s2"))
    .toDF("doc_id", "text", "source")

  test("TermIndex.termFrequencies: per-doc occurrence counts") {
    val tf = TermIndex.termFrequencies(docs, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(tf((1L, "apple")) == 2L && tf((1L, "banana")) == 1L &&
      tf((3L, "date")) == 3L)
  }

  test("TermIndex.tfidfTopK: tf/df ranking with lexicographic tie-break") {
    // doc 1: apple tf=2 df=2 -> 1.0; banana tf=1 df=2 -> 0.5
    // doc 3: date tf=3 df=1 -> 3.0; apple tf=1 df=2 -> 0.5
    val top = TermIndex.tfidfTopK(docs, "doc_id", col("text"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top == Map(1L -> "apple", 2L -> "cherry", 3L -> "date"))
    // tie case: doc 2 has banana (1/2) and cherry (1/1) -> cherry wins;
    // with k=2 both appear with deterministic ranks
    val d2 = TermIndex.tfidfTopK(docs, "doc_id", col("text"), k = 2)
      .filter(col("doc_id") === 2L)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(d2 == Seq("cherry", "banana"))
  }

  test("TermIndex.topicCooccurrence: top-k basket pairs with exact lift") {
    // baskets (k=2): doc1 {apple,banana}, doc2 {banana,cherry},
    // doc3 {apple,date}; basket freq: apple=2 banana=2 cherry=1 date=1
    val got = TermIndex.topicCooccurrence(docs, "doc_id", col("text"),
        k = 2, minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("apple", "banana") -> (1L, 1.0 * 3 / 4),
      ("banana", "cherry") -> (1L, 1.0 * 3 / 2),
      ("apple", "date") -> (1L, 1.0 * 3 / 2)))
    // support floor drops everything on this fixture
    assert(TermIndex.topicCooccurrence(docs, "doc_id", col("text"),
      k = 2, minSupport = 2L).count() == 0)
  }

  test("TermIndex.rarity: corpus-frequency profile") {
    // cf: apple=3, banana=2, cherry=1, date=3
    val r = TermIndex.rarity(docs, "doc_id", col("text"))
      .filter(col("doc_id") === 2L).collect().head
    assert(r.getAs[Long]("n_tokens") == 2L)
    assert(r.getAs[Long]("n_distinct_terms") == 2L)
    assert(r.getAs[Long]("min_cf") == 1L)
    assert(r.getAs[Long]("max_cf") == 2L)
    assert(r.getAs[Double]("mean_cf") == 1.5)
  }

  test("TermIndex.invertedIndex: df + numerically-sorted capped postings") {
    val idx = TermIndex.invertedIndex(docs, "doc_id", col("text"),
      n = 1, maxPostings = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(idx("apple") == (2L, "1,3"))
    assert(idx("date") == (1L, "3"))
    // cap: a term in all 3 docs keeps only the 2 lowest ids
    val wide = Seq((10L, "x"), (2L, "x"), (9L, "x")).toDF("doc_id", "text")
    val caps = TermIndex.invertedIndex(wide, "doc_id", col("text"), 1, 2)
      .collect().head
    assert(caps.getLong(1) == 3L && caps.getString(2) == "2,9")
  }

  test("SpanDedup.dupSpans: cross-doc repeated spans, within-doc repeats excluded") {
    val d = Seq(
      (1L, "a b c d"), // spans: "a b", "b c", "c d"
      (2L, "b c x b c"), // spans: "b c", "c x", "x b", "b c" (b c twice!)
      (3L, "q r")) // span: "q r" — unique, no dups
      .toDF("doc_id", "text")
    val out = SpanDedup.dupSpans(d, "doc_id", col("text"), n = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("total_spans"), r.getAs[Long]("dup_spans"),
          r.getAs[Long]("dup_shingles"))).toMap
    // "b c" is the only span in >=2 docs; doc 2 has it at 2 positions
    assert(out(1L) == (3L, 1L, 1L))
    assert(out(2L) == (4L, 2L, 1L))
    assert(out(3L) == (1L, 0L, 0L))
  }

  test("SpanDedup.dupCoverage: overlapping spans merge; split islands " +
    "sum; short/clean docs emit zero rows") {
    val d = Seq(
      // docs 1+2 share the run "a b c d e": 3-gram positions 0,1,2 ->
      // intervals [0,2],[1,3],[2,4] merge to ONE island of 5 tokens
      (1L, "a b c d e x y"),
      (2L, "a b c d e p q"),
      // doc 4 repeats doc 5's "a b c" at positions 0 and 7 -> two
      // separate islands of 3, summing to 6
      (4L, "a b c q r s t a b c"),
      (5L, "a b c m"),
      // no cross-doc repeats; shorter than n
      (3L, "z z z"), (6L, "q"))
      .toDF("doc_id", "text")
    val out = SpanDedup.dupCoverage(d, "doc_id", col("text"), n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens")))
      .toMap
    assert(out(1L) == (7L, 5L)) // merged island, not 3 x 3 = 9
    assert(out(2L) == (7L, 5L))
    assert(out(4L) == (10L, 6L)) // two islands of 3
    assert(out(5L) == (4L, 3L))
    assert(out(3L) == (3L, 0L)) // clean doc still emits a row
    assert(out(6L) == (1L, 0L)) // sub-n doc still emits a row
  }

  test("SpanDedup.contaminationScore: benchmark docs 1.0, clean docs " +
    "0.0, partial copies graded; short docs emit nothing") {
    val corpus = Seq(
      (1L, "a b c d e"),           // the benchmark doc itself
      (2L, "a b c d x"),           // shares bigrams a-b b-c c-d of 4
      (3L, "p q r s t"),           // disjoint
      (4L, "z"))                   // shorter than n — no grams
      .toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 1L)
    val out = SpanDedup.contaminationScore(corpus, bench, "doc_id",
      col("text"), n = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((4L, 3L, 0.75)))
    assert(out(3L) == ((4L, 0L, 0.0)))
    assert(!out.contains(4L))
  }

  test("SpanDedup.sourceOverlap: unordered pairs, distinct shingles, cap") {
    val d = Seq(
      (1L, "a b c", "s1"), (2L, "a b z", "s2"), (3L, "b c y", "s2"),
      (4L, "a b q", "s3"))
      .toDF("doc_id", "text", "source")
    // 2-gram "a b" in s1,s2,s3; "b c" in s1,s2
    val out = SpanDedup.sourceOverlap(d, "doc_id", "source", col("text"), 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("s1", "s2") -> 2L, ("s1", "s3") -> 1L,
      ("s2", "s3") -> 1L))
    // cap 2 drops "a b" (3 sources) before pairing
    val capped = SpanDedup.sourceOverlap(d, "doc_id", "source", col("text"),
      2, maxSourcesPerShingle = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped == Map(("s1", "s2") -> 1L))
  }
}
