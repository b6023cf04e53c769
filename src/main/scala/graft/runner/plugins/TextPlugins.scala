package graft.runner.plugins

import org.apache.spark.sql.functions._

import graft.operators.{Components, Decontaminate, Dedup, Fingerprint,
  LangId, Resample, Sample, Scrub, SequencePack, SpanDedup, Split,
  TermIndex, TextStats}
import graft.runner._

/** The LLM-data-pipeline extensions as ordinary runner plugins (SURVEY
  * §7 step 6: "all as ordinary plugins") — the same operator library
  * the query harness verifies, addressable from YAML pipelines.
  */

/** `text_dedup` — corpus dedup step: exact dedup by md5(text), plus
  * optional near-dedup (`min_jaccard`) via n-gram Jaccard pairs →
  * connected components, keeping each cluster's minimum id. Writes the
  * surviving rows as parquet.
  *
  * Args: `input` (documents parquet), `output_path`, optional `id_col`
  * (default doc_id), `text_col` (default text), `min_jaccard` (off =
  * exact only), `ngram` (default 3).
  */
object TextDedupPlugin extends StepPlugin {
  val name = "text_dedup"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val minJ = ctx.argOpt("min_jaccard").map(_.toString.toDouble)
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)

    val docs = ctx.spark.read.parquet(in)
    val nIn = docs.count()
    // exact pass first: cheapest, always on (one hash-aggregate window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol)))
    val exactKept = docs
      .withColumn("__keep", col(idCol) === min(col(idCol)).over(w))
      .filter(col("__keep")).drop("__keep")
    minJ match {
      case Some(j) =>
        // near-dup clusters over the exact survivors; keep cluster
        // minima. exactKept feeds TWO consumers (the shingle build and
        // the final anti join) — persist so the full-corpus md5-window
        // pass runs once, per the library-wide multi-consumer rule
        exactKept.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val pairs = Dedup.ngramJaccardPairs(exactKept, idCol,
            col(textCol), n = n, minJaccard = j)
          val losers = Components.connected(pairs, "doc_a", "doc_b")
            .filter(col("id") =!= col("component"))
            .select(col("id").as(idCol))
          exactKept.join(losers, Seq(idCol), "left_anti")
            .write.mode("overwrite").parquet(out)
        } finally exactKept.unpersist()
      case None =>
        exactKept.write.mode("overwrite").parquet(out)
    }
    val nKept = ctx.spark.read.parquet(out).count()
    StepResult(Map("output_path" -> out,
      "n_in" -> nIn, "n_kept" -> nKept,
      "n_dropped" -> (nIn - nKept)))
  }
}

/** `text_cross_dedup` — dedup a new corpus AGAINST A REFERENCE corpus
  * ([[Dedup.crossCorpusBest]]): the incremental-crawl pass that drops
  * documents already present (near-verbatim) in yesterday's training
  * set. Writes the per-doc best-match audit to `matches_path` (when
  * given) and the cleaned corpus (matched docs dropped) to
  * `output_path`.
  *
  * Args: `input` (new corpus), `reference_input`, `output_path`;
  * optional `matches_path`, `id_col` (doc_id), `text_col` (text),
  * `ngram` (3), `min_jaccard` (0.5), `max_doc_freq` (unset).
  */
object TextCrossDedupPlugin extends StepPlugin {
  val name = "text_cross_dedup"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)
    val minJ = ctx.argOpt("min_jaccard").map(_.toString.toDouble)
      .getOrElse(0.5)
    val cap = ctx.argOpt("max_doc_freq").map(_.toString.toInt)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    val ref = ctx.spark.read.parquet(ctx.argStr("reference_input"))
    val matches = Dedup.crossCorpusBest(docs, ref, idCol, col(textCol),
      n = n, minJaccard = minJ, maxDocFreq = cap)
      .withColumnRenamed("doc_id", idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      ctx.argOpt("matches_path").map(_.toString).foreach(p =>
        matches.write.mode("overwrite").parquet(p))
      docs.join(matches.select(idCol), Seq(idCol), "left_anti")
        .write.mode("overwrite").parquet(out)
      val nIn = docs.count()
      val nMatched = matches.count()
      StepResult(Map("output_path" -> out, "n_in" -> nIn,
        "n_matched" -> nMatched, "n_kept" -> (nIn - nMatched)))
    } finally matches.unpersist()
  }
}

/** `text_drift` — corpus drift audit against a reference corpus
  * ([[graft.operators.Drift]]): writes the top-k over-represented
  * terms (Laplace-smoothed probability ratio) to `output_path` and,
  * when `oov_path` is given, the per-source out-of-vocabulary rates —
  * the mixture-shift + tokenizer-coverage screen a refresh pipeline
  * runs before accepting a new cut.
  *
  * Args: `input` (new corpus), `reference_input`, `output_path`;
  * optional `oov_path`, `text_col` (text), `source_col` (source),
  * `top_k` (50).
  */
object TextDriftPlugin extends StepPlugin {
  val name = "text_drift"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val srcCol = ctx.argOpt("source_col").map(_.toString)
      .getOrElse("source")
    val topK = ctx.argOpt("top_k").map(_.toString.toInt).getOrElse(50)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    val ref = ctx.spark.read.parquet(ctx.argStr("reference_input"))
    graft.operators.Drift.termDrift(docs, ref, col(textCol), topK)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val drifted = ctx.spark.read.parquet(out)
    val maxRatio = drifted.agg(coalesce(max(col("ratio")), lit(0.0)))
      .head().getDouble(0)
    val fields = scala.collection.mutable.Map[String, Any](
      "output_path" -> out, "n_terms" -> drifted.count(),
      "max_ratio" -> maxRatio)
    ctx.argOpt("oov_path").map(_.toString).foreach { p =>
      graft.operators.Drift.oovRate(docs, ref, col(textCol), col(srcCol))
        .coalesce(1).write.mode("overwrite").parquet(p)
      val oov = ctx.spark.read.parquet(p)
      fields += ("oov_path" -> p)
      fields += ("worst_oov_rate" ->
        oov.agg(coalesce(max(col("oov_rate")), lit(0.0))).head()
          .getDouble(0))
    }
    StepResult(fields.toMap)
  }
}

/** `text_quality` — per-document stats + language ID + keep/drop
  * verdict (the quality_filter surface as a pipeline step).
  *
  * Args: `input`, `output_path`, optional `id_col`, `text_col`,
  * `min_tokens` (default 20), `max_tokens` (default 500).
  */
object TextQualityPlugin extends StepPlugin {
  val name = "text_quality"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val minTok = ctx.argOpt("min_tokens").map(_.toString.toLong).getOrElse(20L)
    val maxTok = ctx.argOpt("max_tokens").map(_.toString.toLong).getOrElse(500L)

    val scored = LangId(
      TextStats(ctx.spark.read.parquet(in), col(textCol)), col(textCol))
    val verdicts = scored.select(
      col(idCol), col("n_tokens"), col("stopword_ratio"), col("lang_pred"),
      when(col("n_tokens") < minTok, "too_short")
        .when(col("n_tokens") > maxTok, "too_long")
        .when(col("stopword_ratio") < 0.01, "no_stopwords")
        .when(col("lang_pred") =!= "en", "not_english")
        .otherwise("keep").as("verdict"))
    verdicts.write.mode("overwrite").parquet(out)
    val byVerdict = ctx.spark.read.parquet(out)
      .groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    StepResult(Map("output_path" -> out,
      "n_keep" -> byVerdict.getOrElse("keep", 0L),
      "n_total" -> byVerdict.values.sum))
  }
}

/** `text_fingerprint` — winnowing fingerprint extraction as a step
  * (containment/overlap index build; [[Fingerprint.winnowFingerprints]]).
  *
  * Args: `input`, `output_path`, optional `id_col`, `text_col`,
  * `ngram` (default 3), `window` (default 4).
  */
object TextFingerprintPlugin extends StepPlugin {
  val name = "text_fingerprint"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)
    val w = ctx.argOpt("window").map(_.toString.toInt).getOrElse(4)

    Fingerprint.winnowFingerprints(ctx.spark.read.parquet(in),
        idCol, col(textCol), n = n, w = w)
      .write.mode("overwrite").parquet(out)
    val nFps = ctx.spark.read.parquet(out).count()
    StepResult(Map("output_path" -> out, "n_fingerprints" -> nFps))
  }
}

/** `text_span_audit` — exact-substring duplication audit as a step
  * ([[SpanDedup]]): per-document repeated-span profile (`dup_spans
  * .parquet`) and the source-pair shared-n-gram overlap matrix
  * (`source_overlap.parquet`).
  *
  * Args: `input`, `output_dir`, optional `id_col` (doc_id), `text_col`
  * (text), `source_col` (source), `ngram` (default 8), `flag_ratio`
  * (default 0.5 — a doc whose dup_span_ratio meets it is counted
  * flagged), `max_sources_per_shingle` (default 0 = uncapped).
  */
object TextSpanAuditPlugin extends StepPlugin {
  val name = "text_span_audit"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val outDir = ctx.argStr("output_dir")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val srcCol = ctx.argOpt("source_col").map(_.toString).getOrElse("source")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(8)
    val flagRatio = ctx.argOpt("flag_ratio").map(_.toString.toDouble)
      .getOrElse(0.5)
    val cap = ctx.argOpt("max_sources_per_shingle")
      .map(_.toString.toInt).getOrElse(0)

    val docs = ctx.spark.read.parquet(in)
    val spansPath = s"$outDir/dup_spans.parquet"
    val coveragePath = s"$outDir/dup_coverage.parquet"
    val overlapPath = s"$outDir/source_overlap.parquet"
    SpanDedup.dupSpans(docs, idCol, col(textCol), n)
      .write.mode("overwrite").parquet(spansPath)
    SpanDedup.dupCoverage(docs, idCol, col(textCol), n)
      .write.mode("overwrite").parquet(coveragePath)
    SpanDedup.sourceOverlap(docs, idCol, srcCol, col(textCol), n,
        maxSourcesPerShingle = cap)
      .write.mode("overwrite").parquet(overlapPath)
    val coverage = ctx.spark.read.parquet(coveragePath)
    // flag on the merged-interval coverage, not raw position counts:
    // overlapping spans would overstate how much text is copied
    val flagged = coverage.filter(col("coverage_ratio") >= flagRatio).count()
    StepResult(Map(
      "dup_spans_path" -> spansPath,
      "dup_coverage_path" -> coveragePath,
      "source_overlap_path" -> overlapPath,
      "n_docs" -> coverage.count(),
      "n_flagged" -> flagged,
      "n_source_pairs" -> ctx.spark.read.parquet(overlapPath).count()))
  }
}

/** `text_resample` — domain-mixture rebalancing as a step
  * ([[Resample.toMixture]]): replicate/thin each stratum to its target
  * share of a row budget, deterministically.
  *
  * Args: `input`, `output_path`, `budget` (rows), `weights` (YAML map
  * stratum → weight), optional `id_col` (doc_id), `stratum_col`
  * (source), `default_weight` (0 = drop unlisted strata).
  */
object TextResamplePlugin extends StepPlugin {
  val name = "text_resample"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val budget = ctx.argStr("budget").toLong
    val weights = ctx.argOpt("weights") match {
      case Some(m: Map[_, _]) => m.map { case (k, v) =>
        k.toString -> v.toString.toDouble }
      case _ => sys.error("text_resample: 'weights' map is required")
    }
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val stCol = ctx.argOpt("stratum_col").map(_.toString).getOrElse("source")
    val defW = ctx.argOpt("default_weight").map(_.toString.toDouble)
      .getOrElse(0.0)

    val docs = ctx.spark.read.parquet(in)
    Resample.toMixture(docs, col(idCol), col(stCol), weights, budget, defW)
      .write.mode("overwrite").parquet(out)
    val outDf = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out,
      "n_in" -> docs.count(), "n_out" -> outDf.count()))
  }
}

/** `text_scrub` — PII redaction as a step ([[Scrub.scrub]]): rewrite
  * the text column with emails/IPs/phones replaced by sentinels, and
  * report corpus-wide redaction counts.
  *
  * Args: `input`, `output_path`, optional `id_col` (doc_id),
  * `text_col` (text).
  */
object TextScrubPlugin extends StepPlugin {
  val name = "text_scrub"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")

    val docs = ctx.spark.read.parquet(in)
    val scrubbed = Scrub.scrub(docs, col(idCol), col(textCol))
    docs.drop(textCol)
      .join(scrubbed.withColumnRenamed("doc_id", idCol)
        .withColumnRenamed("clean", textCol), Seq(idCol))
      .write.mode("overwrite").parquet(out)
    val totals = scrubbed.agg(coalesce(sum("n_emails"), lit(0L)),
      coalesce(sum("n_ips"), lit(0L)),
      coalesce(sum("n_phones"), lit(0L))).head()
    StepResult(Map("output_path" -> out,
      "n_docs" -> ctx.spark.read.parquet(out).count(),
      "n_emails" -> totals.getLong(0),
      "n_ips" -> totals.getLong(1),
      "n_phones" -> totals.getLong(2)))
  }
}

/** `text_term_index` — term-level curation artifacts as a step
  * ([[TermIndex]]): tf/df top-k distinctive terms per document
  * (`term_topk.parquet`) and the capped inverted word-n-gram index
  * (`inverted_index.parquet`).
  *
  * Args: `input`, `output_dir`, optional `id_col` (doc_id), `text_col`
  * (text), `top_k` (default 5), `ngram` (default 3), `max_postings`
  * (default 10).
  */
object TextTermIndexPlugin extends StepPlugin {
  val name = "text_term_index"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val outDir = ctx.argStr("output_dir")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val k = ctx.argOpt("top_k").map(_.toString.toInt).getOrElse(5)
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)
    val maxPost = ctx.argOpt("max_postings").map(_.toString.toInt)
      .getOrElse(10)

    val docs = ctx.spark.read.parquet(in)
    val topkPath = s"$outDir/term_topk.parquet"
    val indexPath = s"$outDir/inverted_index.parquet"
    TermIndex.tfidfTopK(docs, idCol, col(textCol), k)
      .write.mode("overwrite").parquet(topkPath)
    TermIndex.invertedIndex(docs, idCol, col(textCol), n, maxPost)
      .write.mode("overwrite").parquet(indexPath)
    StepResult(Map(
      "term_topk_path" -> topkPath,
      "inverted_index_path" -> indexPath,
      "n_terms" -> ctx.spark.read.parquet(indexPath).count(),
      "n_docs" -> docs.count()))
  }
}

/** `text_decontaminate` — benchmark-leak removal
  * ([[Decontaminate.flag]]): drop every corpus doc sharing a distinct
  * word n-gram with the held-out benchmark set. The benchmark shingle
  * set broadcasts; the corpus never shuffles for the overlap test.
  *
  * Args: `input`, `benchmark_input`, `output_path` (surviving rows),
  * optional `flags_path` (the per-doc verdicts), `id_col` (doc_id),
  * `text_col` (text), `ngram` (default 8).
  */
object TextDecontaminatePlugin extends StepPlugin {
  val name = "text_decontaminate"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(8)
    val docs = ctx.spark.read.parquet(in)
    val bench = ctx.spark.read.parquet(ctx.argStr("benchmark_input"))
    val flags = Decontaminate.flag(docs, bench, idCol, col(textCol), n)
    // flags feed the keep-join and (optionally) their own sink — and
    // computing them costs the full corpus shingle pass: persist
    flags.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      ctx.argOpt("flags_path").foreach(p =>
        flags.write.mode("overwrite").parquet(p.toString))
      docs.join(flags.filter(col("keep")).select(col(idCol)), Seq(idCol))
        .write.mode("overwrite").parquet(out)
      val nIn = flags.count()
      val nKept = ctx.spark.read.parquet(out).count()
      StepResult(Map("output_path" -> out, "n_in" -> nIn,
        "n_kept" -> nKept, "n_contaminated" -> (nIn - nKept)))
    } finally flags.unpersist()
  }
}

/** `text_contamination_score` — graded per-doc benchmark overlap
  * ([[SpanDedup.contaminationScore]]): the continuous complement to
  * `text_decontaminate`'s hard drop — fraction of each doc's distinct
  * word n-grams present anywhere in the benchmark, for thresholding
  * and audit. Args: `input`, `benchmark_input`, `output_path`;
  * optional `id_col` (doc_id), `text_col` (text), `ngram` (8),
  * `max_contamination` (when set, also writes the docs at or below
  * the threshold to `clean_path`).
  */
object TextContaminationScorePlugin extends StepPlugin {
  val name = "text_contamination_score"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(8)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    val bench = ctx.spark.read.parquet(ctx.argStr("benchmark_input"))
    SpanDedup.contaminationScore(docs, bench, idCol, col(textCol), n)
      .write.mode("overwrite").parquet(out)
    val scores = ctx.spark.read.parquet(out)
    val extra = ctx.argOpt("max_contamination").map { t =>
      val thr = t.toString.toDouble
      val cleanPath = ctx.argStr("clean_path")
      docs.join(scores.filter(col("contamination") <= thr)
          .select(col(idCol)), Seq(idCol))
        .write.mode("overwrite").parquet(cleanPath)
      Map[String, Any]("clean_path" -> cleanPath,
        "n_clean" -> ctx.spark.read.parquet(cleanPath).count())
    }.getOrElse(Map.empty[String, Any])
    StepResult(Map("output_path" -> out, "n_scored" -> scores.count(),
      "n_flagged" -> scores.filter(col("contamination") > 0).count())
      ++ extra)
  }
}

/** `text_pack` — sequence packing ([[SequencePack.pack]]): assign every
  * doc its (pack_id, pack_offset) training-sequence coordinates via the
  * distributed two-pass prefix sum.
  *
  * Args: `input`, `output_path`, optional `id_col` (doc_id) or
  * `id_expr` (a SQL expression when no single column is unique — e.g.
  * a resampled mixture repeats doc_id per copy, so
  * `doc_id * 1024 + copy_idx`), `source_col` (source), `text_col`
  * (text; token count = whitespace tokens), `seq_len` (default 2048),
  * `buckets` (default 64).
  */
object TextPackPlugin extends StepPlugin {
  val name = "text_pack"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val id = ctx.argOpt("id_expr").map(e => expr(e.toString))
      .getOrElse(col(ctx.argOpt("id_col").map(_.toString)
        .getOrElse("doc_id")))
    val srcCol = ctx.argOpt("source_col").map(_.toString).getOrElse("source")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val seqLen = ctx.argOpt("seq_len").map(_.toString.toInt).getOrElse(2048)
    val buckets = ctx.argOpt("buckets").map(_.toString.toInt).getOrElse(64)
    val docs = ctx.spark.read.parquet(in)
    SequencePack.pack(docs, id, col(srcCol),
        size(TextStats.tokens(col(textCol))), seqLen, buckets)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_docs" -> res.count(),
      "n_packs" -> res.select("source", "pack_id").distinct().count()))
  }
}

/** `text_cosine_pairs` — sparse TF-IDF doc-doc cosine similarity over
  * the inverted n-gram-shingle index ([[TermIndex.cosinePairs]]): the
  * near-dup pair finder that never goes all-pairs — candidates come
  * from the postings self-join, df-capped so a stop-shingle cannot
  * create a quadratic hot term (the 100 TB-safe form; the dense
  * embedding twin is `embedding_semdedup`).
  *
  * Args: `input` (documents parquet), `output_path` (pairs id_a < id_b
  * with their cosine). Optional `id_col` (doc_id), `text_col` (text),
  * `ngram` (shingle width, default 3), `min_cosine` (default 0.3),
  * `max_df` (postings cap per term, default 100).
  */
object TextCosinePairsPlugin extends StepPlugin {
  val name = "text_cosine_pairs"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)
    val minCos = ctx.argOpt("min_cosine").map(_.toString.toDouble)
      .getOrElse(0.3)
    val maxDf = ctx.argOpt("max_df").map(_.toString.toLong).getOrElse(100L)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    val occurrences = Fingerprint
      .explodedShingles(docs, idCol, col(textCol), n = n)
      .select(col(idCol).as("id"), col("sh").as("term"))
    TermIndex.cosinePairs(occurrences, minCosine = minCos, maxDf = maxDf)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_pairs" -> res.count()))
  }
}

/** `text_leakage_split` — near-dup-cluster-aware train/val/test
  * assignment ([[graft.operators.Split.assignByRepresentative]]): the
  * split hash keys on each document's duplicate-cluster representative
  * (n-gram Jaccard pairs → connected components, its own id outside
  * any cluster), so a near-copy of a training document can never land
  * in a held-out set — the contamination a plain per-id split silently
  * allows. Same determinism contract as any md5-threshold split:
  * reproducible across runs, partitionings and corpus growth.
  *
  * Args: `input` (documents parquet), `output_path` (doc rows +
  * `rep` + `split`). Optional `id_col` (doc_id), `text_col` (text),
  * `ngram` (default 3), `min_jaccard` (clustering threshold, default
  * 0.5), `weights` ("name=w,name=w,…" in priority order; default
  * "train=0.8,val=0.1,test=0.1").
  */
object TextLeakageSplitPlugin extends StepPlugin {
  val name = "text_leakage_split"

  private[plugins] def parseWeights(s: String): Seq[(String, Double)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim -> v.trim.toDouble
    }

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)
    val minJ = ctx.argOpt("min_jaccard").map(_.toString.toDouble)
      .getOrElse(0.5)
    val weights = parseWeights(ctx.argOpt("weights").map(_.toString)
      .getOrElse("train=0.8,val=0.1,test=0.1"))
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    val pairs = Dedup.ngramJaccardPairs(docs, idCol, col(textCol),
      n = n, minJaccard = minJ)
    val comp = Components.connected(pairs, "doc_a", "doc_b")
      .select(col("id").as(idCol), col("component"))
    Split.assignByRepresentative(
        docs.join(comp, Seq(idCol), "left"),
        col(idCol), col("component"), weights)
      .drop("component")
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    val perSplit = res.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    StepResult(Map("output_path" -> out, "n_docs" -> res.count()) ++
      perSplit.map { case (k, v) => s"n_$k" -> (v: Any) })
  }
}

/** `text_cluster_weights` — soft-dedup sampling weights
  * ([[graft.operators.Components.memberWeights]]): `1/|cluster|` per
  * near-dup cluster member, 1.0 for singletons — the keep-everything
  * alternative to `text_dedup`'s drop-the-copies, with each distinct
  * work contributing equally to a weight-sampled training mix.
  *
  * Args: `input`, `output_path` ((id, cluster_size, weight)).
  * Optional `id_col` (doc_id), `text_col` (text), `ngram` (default
  * 3), `min_jaccard` (default 0.5).
  */
object TextClusterWeightsPlugin extends StepPlugin {
  val name = "text_cluster_weights"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val n = ctx.argOpt("ngram").map(_.toString.toInt).getOrElse(3)
    val minJ = ctx.argOpt("min_jaccard").map(_.toString.toDouble)
      .getOrElse(0.5)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    val pairs = Dedup.ngramJaccardPairs(docs, idCol, col(textCol),
      n = n, minJaccard = minJ)
    Components.memberWeights(docs, idCol, pairs, "doc_a", "doc_b")
      .withColumnRenamed("id", idCol)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_docs" -> res.count(),
      "n_clustered" -> res.filter(col("cluster_size") > 1).count()))
  }
}

/** `text_topic_pairs` — distinctive-term co-occurrence mining
  * ([[graft.operators.TermIndex.topicCooccurrence]]): market-basket
  * pairs over each document's top-`k` tf/df terms with support count
  * and lift; per-document fanout bounded at C(k,2) by construction.
  *
  * Args: `input`, `output_path` ((term_a, term_b, n_ab, lift)).
  * Optional `id_col` (doc_id), `text_col` (text), `top_k` (default 3),
  * `min_support` (default 5).
  */
object TextTopicPairsPlugin extends StepPlugin {
  val name = "text_topic_pairs"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val k = ctx.argOpt("top_k").map(_.toString.toInt).getOrElse(3)
    val minSupport = ctx.argOpt("min_support").map(_.toString.toLong)
      .getOrElse(5L)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    TermIndex.topicCooccurrence(docs, idCol, col(textCol), k, minSupport)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_pairs" -> res.count()))
  }
}

/** `text_group_sample` — deterministic k-without-replacement sample
  * per group ([[graft.operators.Sample.fixedPerGroup]]): the bounded
  * eval-subset / inspection-sample cut (exactly k rows per stratum,
  * salted-hash order statistic — reproducible across engines and
  * stable under corpus growth).
  *
  * Args: `input`, `output_path`. Optional `id_col` (doc_id),
  * `group_col` (source), `k` (default 20).
  */
object TextGroupSamplePlugin extends StepPlugin {
  val name = "text_group_sample"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val grpCol = ctx.argOpt("group_col").map(_.toString).getOrElse("source")
    val k = ctx.argOpt("k").map(_.toString.toInt).getOrElse(20)
    val docs = ctx.spark.read.parquet(ctx.argStr("input"))
    Sample.fixedPerGroup(docs, col(idCol), col(grpCol), k)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_sampled" -> res.count(),
      "n_groups" -> res.select(grpCol).distinct().count()))
  }
}
