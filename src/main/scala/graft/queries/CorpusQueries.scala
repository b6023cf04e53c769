package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.Exact
import graft.operators.{Dsir, NgramLm, Resample, Scrub, SpanDedup, Spread, TermIndex}

/** Corpus-curation term/span analytics over `documents`: distinctive-term
  * extraction, corpus-frequency quality scoring, inverted-index
  * construction, exact-substring duplication profiling, and the
  * source-pair overlap audit ([[graft.operators.TermIndex]],
  * [[graft.operators.SpanDedup]]).
  *
  * Cross-engine exactness: every compared number is an integer count or
  * ONE IEEE double division of two integer-exact values (division is
  * correctly rounded in both engines; `ln`-based idf would not be) — the
  * same discipline as the rest of the battery. Span queries hash-chain
  * shingles in Spark but count n-gram STRINGS in DuckDB; counts agree by
  * the dedup battery's counts-equivalence (collisions ≈ d²/2⁶⁴).
  */
object CorpusQueries extends QueryGroup {

  def tfidfTopK(spark: SparkSession, dir: String): DataFrame =
    TermIndex.tfidfTopK(Tables.documents(spark, dir), "doc_id",
      col("text"), k = 3)

  /** Sparse TF-IDF doc-doc cosine over the inverted 3-gram-shingle
    * index ([[TermIndex.cosinePairs]]): candidates from the postings
    * self-join (df-capped), exact-sum dot products — the sparse twin
    * of the dense near_dup_cosine battery. */
  def sparseCosinePairs(spark: SparkSession, dir: String): DataFrame =
    TermIndex.cosinePairs(
      graft.operators.Fingerprint.explodedShingles(
        Tables.documents(spark, dir), "doc_id", col("text"), n = 3)
        .select(col("doc_id").as("id"), col("sh").as("term")),
      minCosine = 0.3, maxDf = 100)

  def tokenRarity(spark: SparkSession, dir: String): DataFrame =
    TermIndex.rarity(Tables.documents(spark, dir), "doc_id", col("text"))

  /** Distinctive-term co-occurrence pairs with lift
    * ([[TermIndex.topicCooccurrence]]) — the market-basket shape whose
    * per-document fanout is bounded at C(k,2) by construction. Basket =
    * each doc's top-3 tf/df terms (the tfidf_topk relation). */
  def topicCooccurrence(spark: SparkSession, dir: String): DataFrame =
    TermIndex.topicCooccurrence(Tables.documents(spark, dir), "doc_id",
      col("text"), k = 3, minSupport = 5L)

  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    TermIndex.invertedIndex(Tables.documents(spark, dir), "doc_id",
      col("text"), n = 3, maxPostings = 5)

  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.dupSpans(Tables.documents(spark, dir), "doc_id",
      col("text"), n = 8)

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.sourceOverlap(Tables.documents(spark, dir), "doc_id",
      "source", col("text"), n = 8)

  def dupCoverage(spark: SparkSession, dir: String): DataFrame =
    SpanDedup.dupCoverage(Tables.documents(spark, dir), "doc_id",
      col("text"), n = 8)

  /** Domain-mixture weights for the resample query: sources src0..19
    * rebalanced to a 1:2:3:4 cycling target share of a 1000-row budget
    * — small sources upsample (copies ≥ 2), big ones hash-thin. */
  private val mixWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> (1.0 + i % 4)).toMap

  def mixtureResample(spark: SparkSession, dir: String): DataFrame =
    Resample.toMixture(
      Tables.documents(spark, dir).select("doc_id", "source"),
      col("doc_id"), col("source"), mixWeights, budget = 1000L)
      .select("doc_id", "source", "copy_idx")

  /** PII text synthesized deterministically from (doc_id, source) —
    * the corpus itself is digit-free, so both engines build the same
    * email/IP/phone-bearing string and the scrub counts are nonzero
    * and doc-varying (the `doc_id % 3` gateway IP toggles n_ips). */
  private def synthPii(c: DataFrame): Column = concat(
    lit("reach "), col("source"), lit("@mail.example.com or "),
    col("source"), lit(".ops@example.org from 10."),
    (col("doc_id") % 200).cast("string"), lit(".0."),
    (col("doc_id") % 250).cast("string"),
    when(col("doc_id") % 3 === 0, lit(" gw 192.168.1.1"))
      .otherwise(lit("")),
    lit(" tel 555-01"),
    lpad((col("doc_id") % 100).cast("string"), 2, "0"),
    lit(" "), col("text"))

  private val synthPiiSql =
    "'reach ' || source || '@mail.example.com or ' || source || " +
      "'.ops@example.org from 10.' || CAST(doc_id % 200 AS VARCHAR) || " +
      "'.0.' || CAST(doc_id % 250 AS VARCHAR) || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' gw 192.168.1.1' ELSE '' END || " +
      "' tel 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || " +
      "' ' || text"

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    // Spread.up: the scrub regex battery is the kernel —
    // single-threaded on a one-split scan otherwise (guide §2.5)
    val d = Spread.up(Tables.documents(spark, dir), col("doc_id"))
    Scrub.scrub(d, col("doc_id"), synthPii(d))
  }

  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        explode(split(trim(lower(col("text"))), "[ \\t\\n\\r]+")).as("term"))
      .groupBy("source")
      .agg(
        countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("total_tokens"),
        countDistinct("term").as("distinct_terms"),
        (countDistinct("term").cast("double") /
          count(lit(1)).cast("double")).as("type_token_ratio"))

  /** Bigram-LM corpus-fit scoring under the oracle: every 10th doc is
    * the training slice (the decontaminate convention), the rest are
    * scored ([[graft.operators.NgramLm]] — rational branching-factor
    * form; see the operator scaladoc for why not `ln`-perplexity). */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    NgramLm.score(
      docs = d.filter(col("doc_id") % 10 =!= 0),
      lmDocs = d.filter(col("doc_id") % 10 === 0),
      idCol = "doc_id", text = col("text"))
  }

  /** DSIR importance weights under the oracle: English docs play the
    * target distribution, the whole corpus is raw
    * ([[graft.operators.Dsir]], B = 512 md5 buckets). */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    Dsir.weights(docs = d, target = d.filter(col("lang") === "en"),
      idCol = "doc_id", text = col("text"), b = 512)
  }

  /** Length-first curriculum position under the oracle: global rank by
    * (token count asc, doc_id asc) via the distributed two-pass prefix
    * ([[graft.operators.Curriculum]] — identical by construction to the
    * naive global window the oracle runs). */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Curriculum.order(Tables.documents(spark, dir),
        col("doc_id"),
        size(graft.operators.TextStats.tokens(col("text"))).cast("long"))
      .withColumnRenamed("id", "doc_id")

  /** BM25 retrieval under the oracle: the three corpus-frequency-
    * heaviest terms as queries, top-10 docs each
    * ([[graft.operators.Bm25]] — rational-idf form; see the operator
    * scaladoc for why not `ln`). */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    graft.operators.Bm25.topK(d, "doc_id", col("text"),
      graft.operators.Bm25.topTerms(d, "doc_id", col("text"), 3), k = 10)
  }

  /** Z-order key under the oracle: the Morton interleave is pure
    * integer bit arithmetic, bit-identical in both engines
    * ([[graft.operators.ZOrder]]; the layout EFFECT — row-group
    * pruning — is measured in ScanPruningSpec). */
  def zorderKey(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    Tables.documents(spark, dir).select(col("doc_id"),
      (col("doc_id") % 65536).as("x"), (col("n_chars") % 65536).as("y"),
      ZOrder.zValue2(col("doc_id") % 65536, col("n_chars") % 65536)
        .as("zval"))
  }

  /** Deterministic global shuffle under the oracle
    * ([[graft.operators.Shard]]): every doc gets a shard (salted-hash
    * bucket) and a 1-based replay position inside its shard — the
    * training-data resharding cut, produced by ONE hash-partition
    * exchange + in-partition sort (no global window; plan pinned in
    * ShardSpec). */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Shard.assign(
      Tables.documents(spark, dir).select("doc_id"),
      col("doc_id"), numShards = 8)

  /** Corpus snapshot diff under the oracle ([[graft.operators
    * .CorpusDiff]]): "old" is the table minus ids ≡1 (mod 5) with a
    * draft suffix on ids ≡0 (mod 7); "new" is the table minus ids ≡4
    * (mod 5) — so added / removed / changed / unchanged all occur and
    * every status is a pure function of doc_id. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val old = d.filter(col("doc_id") % 5 =!= 1)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [draft]")))
          .otherwise(col("text")))
    val neu = d.filter(col("doc_id") % 5 =!= 4)
    graft.operators.CorpusDiff.diff(old, neu, col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
  }

  /** Per-shard trainer manifest ([[graft.operators.Shard.manifest]])
    * over the corpus_shuffle assignment: docs / whitespace tokens /
    * chars per shard — one bounded-key map-side-combinable aggregate. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    graft.operators.Shard.manifest(
      graft.operators.Shard.assign(d, col("doc_id"), numShards = 8),
      size(split(trim(lower(col("text"))), "[ \\t\\n\\r]+")), col("n_chars"))
  }

  /** Bloom-filter decontamination verdict
    * ([[graft.operators.Bloom]]): docs with doc_id ≡ 0 (mod 19) play
    * the held-out benchmark; their text fingerprints build a k=4,
    * m=4096 filter (≤ 4096 rows — broadcastable at any corpus size)
    * and every document probes it. No false negatives by
    * construction; the handful of false positives are deterministic
    * md5 arithmetic, so the DuckDB oracle reproduces them bit-for-bit
    * (the verdict is hash-checked, not just the law). */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val filter = graft.operators.Bloom.build(
      d.filter(col("doc_id") % 19 === 0), col("text"), k = 4, m = 4096)
    graft.operators.Bloom.probe(d, col("doc_id"), col("text"),
        filter, k = 4, m = 4096)
      .select(col("id").as("doc_id"),
        col("maybe_member").cast("int").as("maybe_member"))
  }

  /** Graded n-gram contamination vs the same benchmark slice the
    * bloom battery uses ([[SpanDedup.contaminationScore]], 8-gram
    * overlap): benchmark docs themselves score 1.0, clean docs 0.0,
    * partial-copy docs in between. */
  def contaminationScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    SpanDedup.contaminationScore(d,
      d.filter(col("doc_id") % 19 === 0), "doc_id", col("text"), n = 8)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "contamination_score" -> (contaminationScore _),
    "bloom_membership" -> (bloomMembership _),
    "corpus_diff" -> (corpusDiff _),
    "shard_manifest" -> (shardManifest _),
    "corpus_shuffle" -> (corpusShuffle _),
    "zorder_key" -> (zorderKey _),
    "bm25_topk" -> (bm25TopK _),
    "curriculum_order" -> (curriculumOrder _),
    "ngram_lm_score" -> (ngramLmScore _),
    "dsir_weights" -> (dsirWeights _),
    "tfidf_topk" -> (tfidfTopK _),
    "topic_cooccurrence" -> (topicCooccurrence _),
    "sparse_cosine_pairs" -> (sparseCosinePairs _),
    "token_rarity" -> (tokenRarity _),
    "inverted_index" -> (invertedIndex _),
    "dup_spans" -> (dupSpans _),
    "dup_coverage" -> (dupCoverage _),
    "source_overlap" -> (sourceOverlap _),
    "mixture_resample" -> (mixtureResample _),
    "pii_scrub" -> (piiScrub _),
    "vocab_growth" -> (vocabGrowth _))

  private val toks = "regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\r]+')"

  /** Shared oracle CTE: one row per (doc_id, term, tf). */
  private val tfCte =
    s"""tf AS (
       |  SELECT doc_id, t AS term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS t FROM documents)
       |  GROUP BY 1, 2)""".stripMargin

  /** Positional word 8-grams (the dup-span unit); i runs so each slice
    * has exactly 8 tokens — docs under 8 tokens emit nothing, matching
    * the Spark side's full-window filter. */
  private def gramCte(n: Int) =
    s"""tok AS (SELECT doc_id, source, $toks AS t FROM documents),
       |occ AS (
       |  SELECT doc_id, source, array_to_string(t[i:i+${n - 1}], ' ') AS s
       |  FROM tok CROSS JOIN unnest(range(1, len(t) - ${n - 2})) AS u(i))"""
      .stripMargin

  /** Decimal-exact mean of a wild-tailed double expression — the
    * DuckDB twin of Spark's [[Exact.davg]] over IEEE-division addends
    * (VARCHAR-routed; see [[Exact.sql.dsumStr]]). */
  private def davgStr(x: String): String =
    s"${Exact.sql.dsumStr(x)} / COUNT($x)"

  /** BM25 constants interpolated from the engine's own Scala doubles
    * (the pagerank-oracle rule: printed-and-reparsed is identity for
    * doubles) and CAST to DOUBLE explicitly: a bare DuckDB numeric
    * literal is DECIMAL, and decimal intermediate arithmetic
    * (`3 * 2.2` → exact 6.6) rounds differently from the double chain
    * Spark runs (measured: 1-ulp score drift on 8/30 rows). */
  private val bm25Oracle: String = {
    val (k1, b) = (1.2, 0.75)
    def dbl(x: Double) = s"CAST($x AS DOUBLE)"
    s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tok),
       |tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY 1, 2),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |q AS (SELECT term FROM (
       |    SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
       |  ORDER BY cf DESC, term LIMIT 3),
       |st AS (SELECT COUNT(*) AS n, ${Exact.sql.davg("dl")} AS avgdl
       |  FROM dl),
       |s AS (SELECT tf.term, tf.doc_id, tf.tf, dfreq.df, dl.dl,
       |    ((st.n - dfreq.df + ${dbl(0.5)}) / (dfreq.df + ${dbl(0.5)})) *
       |    ((tf.tf * ${dbl(k1 + 1)}) /
       |     (tf.tf + ${dbl(k1)} * (${dbl(1 - b)} +
       |      ${dbl(b)} * dl.dl / st.avgdl))) AS score
       |  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       |    JOIN dl USING (doc_id) CROSS JOIN st)
       |SELECT term, doc_id, tf, df, dl, score, CAST(rank AS INT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY term
       |  ORDER BY score DESC, doc_id) AS rank FROM s)
       |WHERE rank <= 10""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // distinct 8-gram STRINGS on both sides (the dedup battery's
    // counts-equivalence to the engine's chained-xxhash64 shingles)
    "contamination_score" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
         |occ AS (
         |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s
         |  FROM tok CROSS JOIN unnest(range(1, len(t) - 6)) AS u(i)),
         |pd AS (SELECT DISTINCT doc_id, s FROM occ),
         |bs AS (SELECT DISTINCT s FROM occ WHERE doc_id % 19 = 0)
         |SELECT pd.doc_id, COUNT(*) AS n_grams,
         |  COUNT(b.s) AS n_matched,
         |  CAST(COUNT(b.s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS contamination
         |FROM pd LEFT JOIN bs b ON pd.s = b.s
         |GROUP BY 1""".stripMargin,
    // the filter and every probe reproduce Bloom's md5 hex-lane
    // arithmetic exactly (sqlPositionLanes), so even the false
    // positives hash-match
    "bloom_membership" -> {
      val lanes = graft.operators.Bloom.sqlPositionLanes("text", 4, 4096)
      def posUnion(from: String): String =
        lanes.map(l => s"SELECT doc_id, $l AS p FROM $from")
          .mkString(" UNION ALL ")
      s"""WITH filt AS (
         |  SELECT DISTINCT p FROM (
         |    ${posUnion("documents WHERE doc_id % 19 = 0 AND text IS NOT NULL")})),
         |docpos AS (
         |  SELECT DISTINCT doc_id, p FROM (
         |    ${posUnion("documents WHERE text IS NOT NULL")})),
         |agg AS (
         |  SELECT dp.doc_id, COUNT(*) AS np, COUNT(f.p) AS nh
         |  FROM docpos dp LEFT JOIN filt f ON dp.p = f.p
         |  GROUP BY dp.doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(a.np > 0 AND a.nh = a.np, FALSE) AS INT)
         |    AS maybe_member
         |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
    },
    // fingerprints compared, never texts; status is id-derivable
    "corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
        |    THEN text || ' [draft]' ELSE text END) AS fp
        |  FROM documents WHERE doc_id % 5 != 1),
        |n AS (SELECT doc_id, md5(text) AS fp
        |  FROM documents WHERE doc_id % 5 != 4)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    "shard_manifest" ->
      s"""WITH s AS (
         |  SELECT ${graft.operators.Shard.sqlShard("doc_id", 8)} AS shard,
         |    len(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\r]+'))
         |      AS n_tok,
         |    n_chars
         |  FROM documents WHERE doc_id IS NOT NULL)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM s GROUP BY 1""".stripMargin,
    // the permutation key is the salted md5 itself (bit-identical
    // cross-engine); shard = first-4-hex-digits % 8 via Shard.sqlShard
    "corpus_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    md5(CAST(doc_id AS VARCHAR) || ':shard') AS hx,
         |    ${graft.operators.Shard.sqlShard("doc_id", 8)} AS shard
         |  FROM documents WHERE doc_id IS NOT NULL)
         |SELECT doc_id, shard,
         |  ROW_NUMBER() OVER (PARTITION BY shard
         |    ORDER BY hx, doc_id) AS shard_pos
         |FROM h""".stripMargin,
    "zorder_key" ->
      s"""SELECT doc_id, doc_id % 65536 AS x, n_chars % 65536 AS y,
         |  ${graft.operators.ZOrder.zValue2Sql("doc_id % 65536",
              "n_chars % 65536")} AS zval
         |FROM documents""".stripMargin,
    "bm25_topk" -> bm25Oracle,
    "curriculum_order" ->
      s"""SELECT doc_id,
         |  CAST(len($toks) AS BIGINT) AS difficulty,
         |  ROW_NUMBER() OVER (ORDER BY CAST(len($toks) AS BIGINT), doc_id)
         |    AS pos
         |FROM documents""".stripMargin,
    "ngram_lm_score" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
         |tr AS (SELECT * FROM tok WHERE doc_id % 10 = 0),
         |sc AS (SELECT * FROM tok WHERE doc_id % 10 != 0),
         |uni AS (SELECT w, COUNT(*) AS cu
         |  FROM (SELECT unnest(t) AS w FROM tr) GROUP BY 1),
         |v AS (SELECT COUNT(*) AS vs FROM uni),
         |bi AS (SELECT t[i] || ' ' || t[i+1] AS sh, COUNT(*) AS cb
         |  FROM tr CROSS JOIN unnest(range(1, len(t))) AS r(i) GROUP BY 1),
         |sb AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS sh
         |  FROM sc CROSS JOIN unnest(range(1, len(t))) AS r(i)),
         |j AS (SELECT s.doc_id,
         |    (COALESCE(u.cu, 0) + v.vs) / (COALESCE(b.cb, 0) + 1) AS inv,
         |    CASE WHEN b.cb IS NULL THEN 1 ELSE 0 END AS oov
         |  FROM sb s LEFT JOIN bi b USING (sh)
         |    LEFT JOIN uni u ON s.w1 = u.w CROSS JOIN v),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM(oov) AS BIGINT) AS n_oov,
         |    ${davgStr("inv")} AS branching
         |  FROM j GROUP BY 1)
         |SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(a.n_oov, 0) AS n_oov,
         |  CASE WHEN a.n_bigrams > 0
         |    THEN CAST(a.n_oov AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE)
         |  END AS oov_rate,
         |  a.branching
         |FROM (SELECT doc_id FROM sc) d LEFT JOIN agg a USING (doc_id)"""
        .stripMargin,
    "dsir_weights" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toks) AS w
         |  FROM documents),
         |f AS (SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(w), 1, 6) AS INTEGER) % 512 AS f
         |  FROM tok),
         |raw AS (SELECT f, COUNT(*) AS cr FROM f GROUP BY 1),
         |tgt AS (SELECT f, COUNT(*) AS ct FROM f WHERE lang = 'en'
         |  GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM f) AS nr,
         |  (SELECT COUNT(*) FROM f WHERE lang = 'en') AS nt),
         |scored AS (SELECT t.doc_id,
         |    CAST((COALESCE(g.ct, 0) + 1) * (tot.nr + 512) AS DOUBLE)
         |      / CAST((COALESCE(r.cr, 0) + 1) * (tot.nt + 512) AS DOUBLE)
         |      AS ratio
         |  FROM f t LEFT JOIN raw r USING (f) LEFT JOIN tgt g USING (f)
         |    CROSS JOIN tot)
         |, agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN ratio > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_tgt_leaning,
         |  ${davgStr("ratio")} AS mean_ratio
         |FROM scored GROUP BY 1)
         |SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
         |  COALESCE(a.n_tgt_leaning, 0) AS n_tgt_leaning, a.mean_ratio
         |FROM (SELECT doc_id FROM documents) d
         |LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // same capped postings, same rational weights, squared/cross
    // products through the VARCHAR-routed decimal sums (products of
    // wild doubles — the dsumStr case), same IEEE cosine chain
    "sparse_cosine_pairs" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
         |shg AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS term
         |  FROM tok CROSS JOIN unnest(range(1, len(t) - 1)) AS u(i)),
         |tf2 AS (SELECT doc_id, term, COUNT(*) AS tf
         |  FROM shg GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf2 GROUP BY 1),
         |post AS MATERIALIZED (SELECT tf2.doc_id, tf2.term,
         |    CAST(tf2.tf AS DOUBLE) / CAST(d.df AS DOUBLE) AS w
         |  FROM tf2 JOIN dfreq d USING (term) WHERE d.df <= 100),
         |norms AS (SELECT doc_id,
         |    SQRT(${Exact.sql.dsumStr("w * w")}) AS nrm
         |  FROM post GROUP BY 1),
         |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    ${Exact.sql.dsumStr("a.w * b.w")} AS dot
         |  FROM post a JOIN post b
         |    ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, dot / (na.nrm * nb.nrm) AS cosine
         |FROM dots
         |  JOIN norms na ON doc_a = na.doc_id
         |  JOIN norms nb ON doc_b = nb.doc_id
         |WHERE dot / (na.nrm * nb.nrm) >= CAST(0.3 AS DOUBLE)"""
        .stripMargin,
    "tfidf_topk" ->
      s"""WITH $tfCte,
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
         |  CAST(df AS BIGINT) AS df,
         |  CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS weight, rank
         |FROM (
         |  SELECT doc_id, term, tf, df,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term)
         |      AS rank
         |  FROM tf JOIN df USING (term))
         |WHERE rank <= 3""".stripMargin,
    // same top-3 basket as tfidf_topk; lift is one double division of
    // two exact integer products
    "topic_cooccurrence" ->
      s"""WITH $tfCte,
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |basket AS (
         |  SELECT doc_id, term FROM (
         |    SELECT doc_id, term,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id
         |        ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC,
         |          term) AS rank
         |    FROM tf JOIN df USING (term))
         |  WHERE rank <= 3),
         |bf AS (SELECT term, COUNT(*) AS n FROM basket GROUP BY 1),
         |p AS (
         |  SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_ab
         |  FROM basket a JOIN basket b
         |    ON a.doc_id = b.doc_id AND a.term < b.term
         |  GROUP BY 1, 2),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT term_a, term_b, CAST(n_ab AS BIGINT) AS n_ab,
         |  CAST(n_ab * n_docs AS DOUBLE) /
         |    CAST(na.n * nb.n AS DOUBLE) AS lift
         |FROM p
         |JOIN bf na ON p.term_a = na.term
         |JOIN bf nb ON p.term_b = nb.term
         |CROSS JOIN n
         |WHERE n_ab >= 5""".stripMargin,
    "token_rarity" ->
      s"""WITH $tfCte,
         |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf
         |  FROM tf GROUP BY 1)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
         |  MIN(cf) AS min_cf, MAX(cf) AS max_cf,
         |  CAST(CAST(SUM(tf * cf) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE) AS mean_cf
         |FROM tf JOIN cf USING (term) GROUP BY 1""".stripMargin,
    "inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, $toks AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |  FROM tok CROSS JOIN unnest(range(1, len(t) - 1)) AS u(i))
         |SELECT s AS shingle, CAST(COUNT(*) AS BIGINT) AS df,
         |  array_to_string((list(doc_id ORDER BY doc_id))[1:5], ',')
         |    AS postings
         |FROM sh GROUP BY 1""".stripMargin,
    "dup_spans" ->
      s"""WITH ${gramCte(8)},
         |pd AS (SELECT doc_id, s, COUNT(*) AS c FROM occ GROUP BY 1, 2),
         |ds AS (SELECT s, COUNT(*) AS nd FROM pd GROUP BY 1)
         |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total_spans,
         |  CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN c END), 0) AS BIGINT)
         |    AS dup_spans,
         |  CAST(COUNT(CASE WHEN nd >= 2 THEN 1 END) AS BIGINT)
         |    AS dup_shingles,
         |  CAST(CAST(COALESCE(SUM(CASE WHEN nd >= 2 THEN c END), 0)
         |      AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) AS dup_span_ratio
         |FROM pd JOIN ds USING (s) GROUP BY 1""".stripMargin,
    // merged-interval union length via gaps-and-islands: both engines
    // run the identical integer window recurrence (new island when the
    // 1-based position exceeds the running max interval end; coverage =
    // max−min+n per island, base-invariant), so covered_tokens is an
    // exact integer on both sides
    "dup_coverage" ->
      s"""WITH ${gramCte(8)},
         |pos AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS s, i AS p
         |  FROM tok CROSS JOIN unnest(range(1, len(t) - 6)) AS u(i)),
         |dup AS (SELECT s FROM (
         |  SELECT s, COUNT(DISTINCT doc_id) AS nd
         |  FROM pos GROUP BY 1) WHERE nd >= 2),
         |dp AS (SELECT doc_id, p FROM pos JOIN dup USING (s)),
         |isl AS (SELECT doc_id, p,
         |  CASE WHEN p > COALESCE(MAX(p + 7) OVER (PARTITION BY doc_id
         |    ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    -1) THEN 1 ELSE 0 END AS newi
         |  FROM dp),
         |grp AS (SELECT doc_id, p,
         |  SUM(newi) OVER (PARTITION BY doc_id ORDER BY p) AS island
         |  FROM isl),
         |cov AS (SELECT doc_id,
         |  CAST(SUM(mx - mn + 8) AS BIGINT) AS covered_tokens
         |  FROM (SELECT doc_id, island, MAX(p) AS mx, MIN(p) AS mn
         |        FROM grp GROUP BY 1, 2) GROUP BY 1)
         |SELECT d.doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
         |  COALESCE(cov.covered_tokens, 0) AS covered_tokens,
         |  CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE)
         |    / CAST(len($toks) AS DOUBLE) AS coverage_ratio
         |FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id"""
        .stripMargin,
    "source_overlap" ->
      s"""WITH ${gramCte(8)},
         |sh AS (SELECT DISTINCT source, s FROM occ)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS shared_shingles
         |FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,
    "mixture_resample" -> Resample.oracleSql(
      "(SELECT doc_id, source FROM documents)", "doc_id", "source",
      mixWeights, budget = 1000L),
    "pii_scrub" -> Scrub.oracleSql(synthPiiSql, "documents"),
    "vocab_growth" ->
      s"""WITH tok AS (
         |  SELECT source, doc_id, unnest($toks) AS term FROM documents)
         |SELECT source,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS total_tokens,
         |  CAST(COUNT(DISTINCT term) AS BIGINT) AS distinct_terms,
         |  CAST(COUNT(DISTINCT term) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS type_token_ratio
         |FROM tok GROUP BY 1""".stripMargin)
}
