package graft.runner.plugins

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Budget, Curriculum, Dsir, Ivf, KCore,
  NgramLm, Outliers, PageRank, SemanticDedup, Shard, Similarity,
  TextStats, Triangles}
import graft.runner._

/** The round-6 curation/analytics operators as runner plugins (SURVEY
  * §7 step 6) — same library the oracle battery verifies, addressable
  * from YAML pipelines.
  */

/** `text_lm_score` — bigram-LM corpus-fit scoring ([[NgramLm.score]]).
  *
  * Args: `input`, `output_path`; the training slice is either
  * `lm_input` (its own parquet) or carved from `input` by
  * `train_mod` (default 10: ids ≡ 0 mod m train, the rest scored).
  * Optional `id_col` (doc_id), `text_col` (text).
  */
object TextLmScorePlugin extends StepPlugin {
  val name = "text_lm_score"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val docs = ctx.spark.read.parquet(in)
    val (lm, scored) = ctx.argOpt("lm_input") match {
      case Some(p) => (ctx.spark.read.parquet(p.toString), docs)
      case None =>
        val m = ctx.argOpt("train_mod").map(_.toString.toInt).getOrElse(10)
        (docs.filter(col(idCol) % m === 0),
          docs.filter(col(idCol) % m =!= 0))
    }
    NgramLm.score(scored, lm, idCol, col(textCol))
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_scored" -> res.count(),
      "n_oov_docs" -> res.filter(col("n_oov") > 0).count()))
  }
}

/** `text_dsir` — DSIR importance weights ([[Dsir.weights]]).
  *
  * Args: `input`, `output_path`, and the target slice as either
  * `target_input` (parquet) or `target_where` (a SQL predicate over
  * the input, e.g. `lang = 'en'`). Optional `id_col`, `text_col`,
  * `buckets` (default 512).
  */
object TextDsirPlugin extends StepPlugin {
  val name = "text_dsir"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val b = ctx.argOpt("buckets").map(_.toString.toInt).getOrElse(512)
    val docs = ctx.spark.read.parquet(in)
    val target = (ctx.argOpt("target_input"), ctx.argOpt("target_where")) match {
      case (Some(p), _) => ctx.spark.read.parquet(p.toString)
      case (None, Some(w)) => docs.filter(expr(w.toString))
      case _ => sys.error(
        "text_dsir: one of 'target_input' / 'target_where' is required")
    }
    Dsir.weights(docs, target, idCol, col(textCol), b)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_docs" -> res.count()))
  }
}

/** `text_curriculum` — global training-order rank
  * ([[Curriculum.order]]), difficulty = whitespace token count of
  * `text_col` or any SQL expression via `difficulty_expr`.
  *
  * Args: `input`, `output_path`, optional `id_col`, `text_col`,
  * `difficulty_expr`, `buckets` (default 64).
  */
object TextCurriculumPlugin extends StepPlugin {
  val name = "text_curriculum"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val buckets = ctx.argOpt("buckets").map(_.toString.toInt).getOrElse(64)
    val diff = ctx.argOpt("difficulty_expr").map(e => expr(e.toString))
      .getOrElse(size(TextStats.tokens(col(textCol))).cast("long"))
    val docs = ctx.spark.read.parquet(in)
    Curriculum.order(docs, col(idCol), diff, buckets)
      .withColumnRenamed("id", idCol)
      .write.mode("overwrite").parquet(out)
    StepResult(Map("output_path" -> out,
      "n_docs" -> ctx.spark.read.parquet(out).count()))
  }
}

/** `embedding_semdedup` — SemDeDup over an embeddings table
  * ([[SemanticDedup.dedupe]]): write the per-vector verdict, and
  * optionally the surviving rows.
  *
  * Args: `input`, `output_path` (verdicts), optional `keep_path`
  * (kept input rows), `id_col` (vec_id), `vec_col` (embedding),
  * `k` (default 8), `iters` (default 1), `min_cosine` (default 0.9).
  */
object EmbeddingSemdedupPlugin extends StepPlugin {
  val name = "embedding_semdedup"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("vec_id")
    val vecCol = ctx.argOpt("vec_col").map(_.toString).getOrElse("embedding")
    val k = ctx.argOpt("k").map(_.toString.toInt).getOrElse(8)
    val iters = ctx.argOpt("iters").map(_.toString.toInt).getOrElse(1)
    val minCos = ctx.argOpt("min_cosine").map(_.toString.toDouble)
      .getOrElse(0.9)
    val raw = ctx.spark.read.parquet(in)
    val verdicts = SemanticDedup.dedupe(
      raw.select(col(idCol).as("id"),
        Similarity.asDouble(col(vecCol)).as("vec")), k, iters, minCos)
    verdicts.write.mode("overwrite").parquet(out)
    val v = ctx.spark.read.parquet(out)
    ctx.argOpt("keep_path").foreach { kp =>
      raw.join(v.filter(col("keep")).select(col("id").as(idCol)), Seq(idCol))
        .write.mode("overwrite").parquet(kp.toString)
    }
    StepResult(Map("output_path" -> out, "n_in" -> v.count(),
      "n_kept" -> v.filter(col("keep")).count()))
  }
}

/** `embedding_outliers` — per-group centroid outlier audit
  * ([[Outliers.byGroup]]).
  *
  * Args: `input`, `output_path`, optional `id_col` (vec_id),
  * `group_col` (label), `vec_col` (embedding), `top_k` (default 5).
  */
object EmbeddingOutliersPlugin extends StepPlugin {
  val name = "embedding_outliers"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("vec_id")
    val grpCol = ctx.argOpt("group_col").map(_.toString).getOrElse("label")
    val vecCol = ctx.argOpt("vec_col").map(_.toString).getOrElse("embedding")
    val k = ctx.argOpt("top_k").map(_.toString.toInt).getOrElse(5)
    Outliers.byGroup(
        ctx.spark.read.parquet(in).select(col(idCol).as("id"),
          col(grpCol).as("grp"),
          Similarity.asDouble(col(vecCol)).as("vec")), k)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_vectors" -> res.count(),
      "n_outliers" -> res.filter(col("is_outlier")).count()))
  }
}

/** `targeted_delete` — keyed deletion over a partitioned dataset
  * ([[graft.operators.Sink.deleteKeys]]): the right-to-be-forgotten
  * step; only partitions holding doomed rows rewrite.
  *
  * Args: `dataset_path`, `keys` (list of key column names), and the
  * doomed keys as either `keys_input` (parquet of key rows) or
  * `where` (SQL predicate over the dataset selecting rows to delete).
  * Optional `partition_cols` (list).
  */
object TargetedDeletePlugin extends StepPlugin {
  val name = "targeted_delete"

  def run(ctx: StepContext): StepResult = {
    val path = ctx.argStr("dataset_path")
    val keys = ctx.argOpt("keys") match {
      case Some(l: Seq[_]) => l.map(_.toString)
      case _ => sys.error("targeted_delete: 'keys' list is required")
    }
    val pcols = ctx.argOpt("partition_cols") match {
      case Some(l: Seq[_]) => l.map(_.toString)
      case _ => Nil
    }
    val before = ctx.spark.read.parquet(path).count()
    val doomed = (ctx.argOpt("keys_input"), ctx.argOpt("where")) match {
      case (Some(p), _) => ctx.spark.read.parquet(p.toString)
      case (None, Some(w)) =>
        ctx.spark.read.parquet(path).filter(expr(w.toString))
      case _ => sys.error(
        "targeted_delete: one of 'keys_input' / 'where' is required")
    }
    graft.operators.Sink.deleteKeys(ctx.spark, path, doomed, keys, pcols)
    val after = ctx.spark.read.parquet(path).count()
    StepResult(Map("dataset_path" -> path, "n_before" -> before,
      "n_after" -> after, "n_deleted" -> (before - after)))
  }
}

/** `graph_pagerank` — PageRank over an edge table ([[PageRank.run]]).
  *
  * Args: `edges_input` (parquet with `src`,`dst`), `output_path`,
  * optional `nodes_input` (vertex parquet with `id`; default = distinct
  * edge endpoints), `iters` (default 5), `damping` (default 0.85),
  * `symmetric` (default false: add reverse edges first).
  */
object GraphPagerankPlugin extends StepPlugin {
  val name = "graph_pagerank"

  def run(ctx: StepContext): StepResult = {
    val ein = ctx.argStr("edges_input")
    val out = ctx.argStr("output_path")
    val iters = ctx.argOpt("iters").map(_.toString.toInt).getOrElse(5)
    val damping = ctx.argOpt("damping").map(_.toString.toDouble)
      .getOrElse(0.85)
    val raw = ctx.spark.read.parquet(ein).select("src", "dst")
    val edges = if (ctx.argBool("symmetric", default = false))
      raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
    else raw
    val nodes = ctx.argOpt("nodes_input") match {
      case Some(p) => ctx.spark.read.parquet(p.toString).select("id")
      case None => edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
    }
    PageRank.run(nodes, edges, iters, damping)
      .write.mode("overwrite").parquet(out)
    StepResult(Map("output_path" -> out,
      "n_nodes" -> ctx.spark.read.parquet(out).count()))
  }
}

/** `text_budget_cap` — per-source token budget ([[Budget.capTokens]]):
  * admit documents in id order until each source's allotment is spent.
  *
  * Args: `input`, `output_path`, `budget` (tokens per source); optional
  * `id_col` (doc_id), `source_col` (source), `text_col` (text;
  * whitespace token count), `keep_only` (true = write survivors only,
  * default false = every row with its `cum_end`/`kept` audit columns).
  */
object TextBudgetCapPlugin extends StepPlugin {
  val name = "text_budget_cap"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val budget = ctx.argStr("budget").toLong
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val srcCol = ctx.argOpt("source_col").map(_.toString).getOrElse("source")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    val docs = ctx.spark.read.parquet(in)
    val audited = Budget.capTokens(docs, col(idCol), col(srcCol),
      size(TextStats.tokens(col(textCol))), budget)
    val result =
      if (ctx.argBool("keep_only", default = false))
        audited.filter(col("kept"))
      else audited
    result.write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_out" -> res.count(),
      "n_kept" -> res.filter(col("kept")).count()))
  }
}

/** `text_quality_floor` — per-source quality percentile floor
  * ([[Budget.percentileFilter]]): drop each source's worst slice by a
  * score's within-source percent rank.
  *
  * Args: `input`, `output_path`, optional `min_pct` (default 0.25 =
  * drop the bottom quartile), `id_col`, `source_col`; the score is
  * `score_col` (a numeric column) or the whitespace token count of
  * `text_col` (default). `keep_only` as in text_budget_cap.
  */
object TextQualityFloorPlugin extends StepPlugin {
  val name = "text_quality_floor"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val minPct = ctx.argOpt("min_pct").map(_.toString.toDouble)
      .getOrElse(0.25)
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val srcCol = ctx.argOpt("source_col").map(_.toString).getOrElse("source")
    val docs = ctx.spark.read.parquet(in)
    val score = ctx.argOpt("score_col").map(c => col(c.toString))
      .getOrElse(size(TextStats.tokens(
        col(ctx.argOpt("text_col").map(_.toString).getOrElse("text")))))
    val audited = Budget.percentileFilter(docs, col(idCol), col(srcCol),
      score, minPct)
    val result =
      if (ctx.argBool("keep_only", default = false))
        audited.filter(col("kept"))
      else audited
    result.write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_out" -> res.count(),
      "n_kept" -> res.filter(col("kept")).count()))
  }
}

/** `graph_triangles` — triangle census + clustering coefficient over an
  * edge table ([[Triangles.perNode]]).
  *
  * Args: `edges_input` (parquet with the edge endpoints), `output_path`;
  * optional `a_col`/`b_col` (default a/b). Edges are canonicalized
  * (min, max) and deduped here, so any undirected edge list works.
  */
object GraphTrianglesPlugin extends StepPlugin {
  val name = "graph_triangles"

  def run(ctx: StepContext): StepResult = {
    val ein = ctx.argStr("edges_input")
    val out = ctx.argStr("output_path")
    val aCol = ctx.argOpt("a_col").map(_.toString).getOrElse("a")
    val bCol = ctx.argOpt("b_col").map(_.toString).getOrElse("b")
    val raw = ctx.spark.read.parquet(ein)
      .select(col(aCol).as("__x"), col(bCol).as("__y"))
      .filter(col("__x") =!= col("__y"))
    val canon = raw.select(least(col("__x"), col("__y")).as("a"),
      greatest(col("__x"), col("__y")).as("b")).distinct()
    Triangles.perNode(canon).write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_nodes" -> res.count(),
      "n_closed" -> res.filter(col("n_tri") > 0).count()))
  }
}

/** `text_bpe_learn` — BPE merge-table induction ([[Bpe.learnMerges]]):
  * learn a tokenizer's merge list from the corpus word histogram.
  *
  * Args: `input`, `output_path`, optional `rounds` (default 16),
  * `text_col` (text).
  */
object TextBpeLearnPlugin extends StepPlugin {
  val name = "text_bpe_learn"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val rounds = ctx.argOpt("rounds").map(_.toString.toInt).getOrElse(16)
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    Bpe.learnMerges(ctx.spark.read.parquet(in), col(textCol), rounds)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_merges" -> res.count()))
  }
}

/** `graph_kcore` — k-core extraction over an edge table
  * ([[KCore.peel]]): fixed-round peeling with per-round checkpoints.
  *
  * Args: `edges_input`, `output_path`, `k`; optional `rounds`
  * (default 8), `a_col`/`b_col` (default a/b), `checkpoint_dir`
  * (reliable checkpoints on clusters; local otherwise).
  */
object GraphKcorePlugin extends StepPlugin {
  val name = "graph_kcore"

  def run(ctx: StepContext): StepResult = {
    val ein = ctx.argStr("edges_input")
    val out = ctx.argStr("output_path")
    val k = ctx.argStr("k").toInt
    val rounds = ctx.argOpt("rounds").map(_.toString.toInt).getOrElse(8)
    val aCol = ctx.argOpt("a_col").map(_.toString).getOrElse("a")
    val bCol = ctx.argOpt("b_col").map(_.toString).getOrElse("b")
    val raw = ctx.spark.read.parquet(ein)
      .select(col(aCol).as("__x"), col(bCol).as("__y"))
      .filter(col("__x") =!= col("__y"))
    val canon = raw.select(least(col("__x"), col("__y")).as("a"),
      greatest(col("__x"), col("__y")).as("b")).distinct()
    KCore.peel(canon, k, rounds,
        ctx.argOpt("checkpoint_dir").map(_.toString))
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_nodes" -> res.count(),
      "n_converged" -> res.filter(col("in_core")).count()))
  }
}

/** `embedding_ann` — IVF approximate-nearest-neighbor over an
  * embeddings table ([[Ivf]]): deterministic k-means training, the
  * cluster-partitioned on-disk index (`partitionBy(cluster_id)`
  * parquet — a probe reads only its `nprobe` cluster directories via
  * Catalyst partition pruning, the 100 TB search path), and optional
  * top-k answers for a query table.
  *
  * Args: `input`, `index_path` (the partitioned index), optional
  * `centroids_path` (persist the trained codebook too), `id_col`
  * (vec_id), `vec_col` (embedding), `clusters` (default 8), `iters`
  * (default 1); `queries_input` + `topk_path` to also answer queries
  * (`query_id_col` defaults to id_col, `query_vec_col` to vec_col)
  * with `k` (default 5) neighbors probing `nprobe` (default 2)
  * clusters — searched AGAINST THE PERSISTED INDEX, proving the
  * pruned-scan round trip, not the in-memory frame.
  */
object EmbeddingAnnPlugin extends StepPlugin {
  val name = "embedding_ann"

  def run(ctx: StepContext): StepResult = {
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("vec_id")
    val vecCol = ctx.argOpt("vec_col").map(_.toString).getOrElse("embedding")
    val clusters = ctx.argOpt("clusters").map(_.toString.toInt).getOrElse(8)
    val iters = ctx.argOpt("iters").map(_.toString.toInt).getOrElse(1)
    val indexPath = ctx.argStr("index_path")
    val corpus = ctx.spark.read.parquet(ctx.argStr("input"))
      .select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("vec"))
    val centroids = Ivf.train(corpus, clusters, iters)
    val assigned = Ivf.assign(corpus, centroids)
    Ivf.writeIndex(assigned, indexPath)
    ctx.argOpt("centroids_path").foreach(p =>
      centroids.write.mode("overwrite").parquet(p.toString))
    val index = ctx.spark.read.parquet(indexPath)
    val extra = ctx.argOpt("queries_input").map { qp =>
      val tp = ctx.argStr("topk_path")
      val qid = ctx.argOpt("query_id_col").map(_.toString).getOrElse(idCol)
      val qvec = ctx.argOpt("query_vec_col").map(_.toString).getOrElse(vecCol)
      val k = ctx.argOpt("k").map(_.toString.toInt).getOrElse(5)
      val nprobe = ctx.argOpt("nprobe").map(_.toString.toInt).getOrElse(2)
      val queries = ctx.spark.read.parquet(qp.toString)
        .select(col(qid).as("qid"),
          Similarity.asDouble(col(qvec)).as("qvec"))
      Ivf.searchTopK(queries, index, centroids, k, nprobe)
        .write.mode("overwrite").parquet(tp)
      Map("topk_path" -> tp,
        "n_answers" -> ctx.spark.read.parquet(tp).count())
    }.getOrElse(Map.empty[String, Any])
    StepResult(Map("index_path" -> indexPath,
      "n_indexed" -> index.count(),
      "n_clusters" -> index.select("cluster_id").distinct().count()) ++ extra)
  }
}

/** `corpus_shard` — deterministic corpus shuffle/reshard
  * ([[Shard]]): assign every row a shard (salted-hash bucket) and a
  * replay position, then write one directory per shard with rows in
  * replay order — the final training-data cut, one exchange total.
  *
  * Args: `input`, `output_path`; optional `num_shards` (default 16),
  * `id_col` (doc_id) or `id_expr` (a SQL expression when no single
  * column is unique — e.g. a resampled mixture repeats doc_id per
  * copy; duplicate ids would make replay positions among the
  * duplicates nondeterministic), `epoch` (default 0 — re-keys the
  * permutation per training epoch), `assign_only` (true = write the
  * flat assignment table instead of the sharded directory layout).
  */
object CorpusShardPlugin extends StepPlugin {
  val name = "corpus_shard"

  def run(ctx: StepContext): StepResult = {
    val in = ctx.argStr("input")
    val out = ctx.argStr("output_path")
    val numShards = ctx.argOpt("num_shards").map(_.toString.toInt)
      .getOrElse(16)
    val id = ctx.argOpt("id_expr").map(e => expr(e.toString))
      .getOrElse(col(ctx.argOpt("id_col").map(_.toString)
        .getOrElse("doc_id")))
    val epoch = ctx.argOpt("epoch").map(_.toString.toInt).getOrElse(0)
    val source = ctx.spark.read.parquet(in)
    if (ctx.argBool("assign_only", default = false))
      Shard.assign(source, id, numShards, epoch)
        .write.mode("overwrite").parquet(out)
    else
      Shard.writeSharded(source, id, numShards, out, epoch)
    val res = ctx.spark.read.parquet(out)
    StepResult(Map("output_path" -> out, "n_rows" -> res.count(),
      "n_shards" -> res.select("shard").distinct().count()))
  }
}

/** `shard_manifest` — per-shard trainer manifest over a sharded cut
  * ([[graft.operators.Shard.manifest]]): doc/token/char totals per
  * shard, the sidecar a training job reads to size epochs/steps
  * before touching data. One map-side-combinable aggregate keyed by
  * the bounded shard id.
  *
  * Args: `input` (a sharded directory or assign table carrying
  * `shard`), `output_path`; optional `tokens_expr` / `chars_expr`
  * (SQL expressions over the cut's columns, default 0 when the cut
  * carries no such column — doc counts alone still pin balance).
  */
object ShardManifestPlugin extends StepPlugin {
  val name = "shard_manifest"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val cut = ctx.spark.read.parquet(ctx.argStr("input"))
    val toks = expr(ctx.argOpt("tokens_expr").map(_.toString)
      .getOrElse("0"))
    val chars = expr(ctx.argOpt("chars_expr").map(_.toString)
      .getOrElse("0"))
    graft.operators.Shard.manifest(cut, toks, chars)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val m = ctx.spark.read.parquet(out)
    val agg = m.agg(coalesce(sum("n_docs"), lit(0L)).as("d"),
      count(lit(1)).as("s")).head()
    StepResult(Map("output_path" -> out, "n_docs" -> agg.getLong(0),
      "n_shards" -> agg.getLong(1)))
  }
}

/** `corpus_diff` — snapshot diff between two document tables
  * ([[graft.operators.CorpusDiff.diff]]): one row per id with status
  * added / removed / changed / unchanged — the audit that turns a full
  * corpus refresh into an incremental one.
  *
  * Args: `old_input`, `new_input`, `output_path`; optional `id_col`
  * (doc_id), `text_col` (text).
  */
object CorpusDiffPlugin extends StepPlugin {
  val name = "corpus_diff"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val textCol = ctx.argOpt("text_col").map(_.toString).getOrElse("text")
    graft.operators.CorpusDiff.diff(
        ctx.spark.read.parquet(ctx.argStr("old_input")),
        ctx.spark.read.parquet(ctx.argStr("new_input")),
        col(idCol), col(textCol))
      .withColumnRenamed("id", idCol)
      .write.mode("overwrite").parquet(out)
    val res = ctx.spark.read.parquet(out)
    def n(s: String) = res.filter(col("status") === s).count()
    StepResult(Map("output_path" -> out, "n_total" -> res.count(),
      "n_added" -> n("added"), "n_removed" -> n("removed"),
      "n_changed" -> n("changed"), "n_unchanged" -> n("unchanged")))
  }
}

/** `bloom_build` — build a Bloom membership filter over a column
  * ([[graft.operators.Bloom.build]]): the bounded (≤ m rows),
  * mergeable, broadcastable form of a blocklist/benchmark set that a
  * 100 TB decontamination pass ships to every probe site.
  *
  * Args: `input`, `output_path`; optional `value_col` (text),
  * `k` (4), `m` (4096).
  */
object BloomBuildPlugin extends StepPlugin {
  val name = "bloom_build"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val valueCol = ctx.argOpt("value_col").map(_.toString).getOrElse("text")
    val k = ctx.argOpt("k").map(_.toString.toInt).getOrElse(4)
    val m = ctx.argOpt("m").map(_.toString.toInt).getOrElse(4096)
    graft.operators.Bloom.build(
        ctx.spark.read.parquet(ctx.argStr("input")), col(valueCol), k, m)
      .write.mode("overwrite").parquet(out)
    StepResult(Map("output_path" -> out,
      "n_bits" -> ctx.spark.read.parquet(out).count(),
      "k" -> k.toLong, "m" -> m.toLong))
  }
}

/** `bloom_probe` — probe a corpus against a [[BloomBuildPlugin]]
  * filter ([[graft.operators.Bloom.probe]]); with `drop_members: true`
  * writes the decontaminated corpus (maybe-members removed — the
  * false-positive-only direction that can drop a clean doc but never
  * leak a benchmark one), otherwise the per-id verdict table.
  *
  * Args: `input`, `filter_path`, `output_path`; optional `id_col`
  * (doc_id), `value_col` (text), `k` (4), `m` (4096),
  * `drop_members` (false).
  */
object BloomProbePlugin extends StepPlugin {
  val name = "bloom_probe"

  def run(ctx: StepContext): StepResult = {
    val out = ctx.argStr("output_path")
    val idCol = ctx.argOpt("id_col").map(_.toString).getOrElse("doc_id")
    val valueCol = ctx.argOpt("value_col").map(_.toString).getOrElse("text")
    val k = ctx.argOpt("k").map(_.toString.toInt).getOrElse(4)
    val m = ctx.argOpt("m").map(_.toString.toInt).getOrElse(4096)
    val corpus = ctx.spark.read.parquet(ctx.argStr("input"))
    val filter = ctx.spark.read.parquet(ctx.argStr("filter_path"))
    val verdict = graft.operators.Bloom.probe(
      corpus, col(idCol), col(valueCol), filter, k, m)
    val flagged = verdict.filter(col("maybe_member"))
    if (ctx.argBool("drop_members", default = false))
      corpus.join(flagged.select(col("id").as(idCol)),
          Seq(idCol), "left_anti")
        .write.mode("overwrite").parquet(out)
    else
      verdict.withColumnRenamed("id", idCol)
        .write.mode("overwrite").parquet(out)
    StepResult(Map("output_path" -> out,
      "n_rows" -> ctx.spark.read.parquet(out).count(),
      "n_flagged" -> flagged.count()))
  }
}
