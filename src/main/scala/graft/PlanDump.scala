package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Builder tool: dump `explain("formatted")` of the headline queries to
  * PLANS.md — the physical-plan evidence behind the scale claims
  * (broadcasts where a side is bounded, shuffle-hash postings joins,
  * partition pruning, pushed filters, whole-stage codegen spans).
  * Regenerate after plan-shape changes:
  * `sbt "runMain graft.PlanDump /root/testdata/sf0.01"`.
  */
object PlanDump {

  private val headline: Seq[(String, String)] = Seq(
    "q1_agg" -> ("Flagship scan→aggregate: pruned ReadSchema + pushed " +
      "date filter, decimal-exact sums inside one codegen span."),
    "j1_multiply" -> ("Dimension join: the small side broadcasts — the " +
      "fact table never shuffles."),
    "a1_zonal_stats" -> ("Zonal percentiles: one shuffle keyed by zone, " +
      "exact percentile aggregate."),
    "dedup_jaccard" -> ("Near-dup pairs: shingle-posting SHUFFLE-HASH " +
      "self-join (no broadcast of a corpus-sized side, no theta join)."),
    "minhash_lsh_candidates" -> ("LSH banding: per-band bucket equi-join; " +
      "the banded table grows with the corpus so it must never broadcast."),
    "near_dup_cosine" -> ("Blocked exact near-dup: centroid/radius " +
      "pruning turns O(n²) into a cluster-pair shuffle equi-join; the " +
      "only cross joins carry the constant k-row centroid set."),
    "ivf_ann" -> ("IVF probe: centroids broadcast, probes prune to their " +
      "clusters; the corpus-side join is keyed by cluster id."),
    "semantic_dedup" -> ("SemDeDup: within-cluster pair search as a " +
      "cluster-keyed shuffle equi-join."),
    "ngram_lm_score" -> ("LM scoring: ONE (w1, successor|NULL) pair " +
      "aggregate carries both training distributions (unigram = " +
      "prefix re-agg, vocab = distinct w1) and is PERSISTED — the r11 " +
      "plan relied on AQE stage reuse that never fired (measured: 8 " +
      "exchanges, 0 ReusedExchange, the LM slice scanned+tokenized+" +
      "pair-aggregated 3x under the cloned consumer subtrees; r11 " +
      "sequential 1.98 s). With the vocabulary-sized InMemoryRelation " +
      "all three consumers read one materialization (r12: 1.10-1.23 s " +
      "solo at sf0.1). Count tables join the postings shuffle-side; " +
      "the 1-row vocab aggregate broadcasts."),
    "dsir_weights" -> ("DSIR: the constant-B bucket stats broadcast onto " +
      "the token stream; only the per-doc aggregate shuffles."),
    "bm25_topk" -> ("BM25: query terms + 1-row (N, avgdl) stats " +
      "broadcast; rank window partitions by term (no global sort)."),
    "sequence_pack" -> ("Two-pass prefix sum: data-sized exchanges hash " +
      "on (source, bucket); the offsets table broadcasts."),
    "curriculum_order" -> ("Two-pass global rank: the only unpartitioned " +
      "window runs over the bounded per-bucket counts."),
    "pagerank" -> ("Power iteration: per-round shuffle equi-join on src " +
      "+ decimal-exact in-mass aggregate; node count rides a broadcast."),
    "w1_rollsum" -> ("Rolling windows: one shuffle, all four window sums " +
      "share the sort."),
    "stream_daily_agg" -> ("Streaming tumbling aggregate (the BATCH-side " +
      "read-back plan of the drained sink)."),
    "scd2_build" -> ("SCD2 history build: lag, the change-point filter, " +
      "and lead all share ONE exchange + sort."),
    "funnel_steps" -> ("Ordered funnel: every stage aggregate and join " +
      "keys on the entity column — one partitioning serves the chain."),
    "count_min_merge" -> ("Count-min workflow: the corpus shuffles " +
      "EXACTLY ONCE, into a persisted per-(source, token) occurrence " +
      "count; the d=4 md5 bucket explode runs over that " +
      "vocabulary-sized frame with count-weighted sums (r12 — the " +
      "per-OCCURRENCE explode was the adjudicated 2.3-3.2x-oracle " +
      "gap; now 1.46-1.62x, 1.5 s -> 0.8 s at sf0.1), and the exact " +
      "heavy-hitter pass re-aggregates the same frame. The <=1024-row " +
      "merged sketch broadcasts to the estimate join."),
    "rolling_actives" -> ("Rolling WAU: explode-to-report-day then one " +
      "two-level exact distinct; no per-day self-join of the log."),
    "triangle_count" -> ("Triangle census: degree-oriented sorted " +
      "out-adjacency arrays (length O(sqrt m)); oriented edges " +
      "regenerate from explode(adjacency) with the src array attached " +
      "free (r13 — the src-attach equi-join is gone), closure per " +
      "edge is an in-task array_intersect, one dst equi-join. Disk-" +
      "bounded spillDir mode chunks the closure into dst hash-bands " +
      "(additive partials) — the sf100 shape."),
    "token_budget_cap" -> ("Per-source token budget: the sequence_pack " +
      "two-pass prefix shape — (source, bucket) exchanges, broadcast " +
      "offsets, no per-source window."),
    "sparse_cosine_pairs" -> ("Sparse TF-IDF cosine: shingle-posting " +
      "SHUFFLE-HASH self-join (df-capped), decimal-exact dot-product " +
      "aggregate; no all-pairs, no broadcast of a corpus-sized side."),
    "hist_quantile_merge" -> ("Mergeable quantiles: partials fold to " +
      "O(bins) rows before the only non-equi join (bins × 4 probes — " +
      "constant by construction)."),
    "leakage_safe_split" -> ("Leakage-safe split: the component " +
      "relation (cluster-sized) joins back on the id key; the split " +
      "assignment itself is a stateless md5-threshold projection — no " +
      "exchange beyond the dedup pipeline it composes."),
    "topic_cooccurrence" -> ("Distinctive-term co-occurrence: basket " +
      "self-join keyed by doc id (fanout C(k,2) by construction), " +
      "vocabulary-sized basket-frequency joins, 1-row corpus count " +
      "broadcast — the only condition-free join."),
    "corpus_shuffle" -> ("Deterministic global shuffle: stateless " +
      "salted-hash projection + ONE hash exchange on shard + " +
      "in-partition sort for the replay position — never a global " +
      "sort or single-partition window."),
    "corpus_diff" -> ("Snapshot diff: both sides fold to (id, md5) " +
      "BEFORE the full-outer join — fingerprints shuffle, texts never " +
      "leave their scan."),
    "shard_manifest" -> ("Trainer manifest: bounded-key hash aggregate " +
      "with map-side partials — the shard exchange carries " +
      "numShards rows per task, not the corpus."),
    "k_core" -> ("k-core peel (one round's shape): degree aggregate + " +
      "survivor SEMI-join back on the edge key — equi-joins only, " +
      "re-planned per checkpointed round, round count tracks the " +
      "peel depth, never the data."),
    "dedup_components_dist" -> ("Distributed connected components: " +
      "per-round min-label exchange keyed by node id; rounds track " +
      "component DIAMETER (tiny for dedup graphs), per-round cost " +
      "is one data-linear shuffle; the round's own aggregate counts " +
      "label changes, so a converged round proves the fixpoint with " +
      "no confirmation round, and the loop width tracks the MEASURED " +
      "edge count (full width above 500k rows/partition)."),
    "simhash" -> ("SimHash: token explode + 16 LANE-PACKED bit " +
      "counters (each hex digit's four counters ride one long as " +
      "16-bit lanes) in ONE map-side-combinable aggregate — the " +
      "generated plan stays small, no per-bit passes, no join."),
    "decontaminate" -> ("Benchmark decontamination: the corpus " +
      "LEFT-ANTI joins the contaminated-id set; benchmark shingles " +
      "are the bounded side of the overlap join."),
    "mixture_resample" -> ("Mixture resampling: per-source rates are " +
      "a bounded broadcast onto a stateless salted-hash keep/repeat " +
      "projection — membership is a pure row-id function, no " +
      "corpus-sized shuffle at all."),
    "tfidf_topk" -> ("TF-IDF top-k: posting aggregate keyed by term, " +
      "1-row corpus count broadcast, rank window PARTITIONED by doc " +
      "— no global sort anywhere."),
    "inverted_index" -> ("Inverted index: one (term)-keyed exchange " +
      "building per-term posting lists with map-side partials; " +
      "doc-frequency cap bounds the hot keys."),
    "sessionize" -> ("Sessionization: lag + gap flag + running " +
      "session id share ONE (user)-keyed exchange and sort — the " +
      "three window functions pipeline in a single pass."),
    "cohort_retention" -> ("Cohort retention: first-touch aggregate " +
      "joins activity on the entity key (same partitioning), then a " +
      "bounded (cohort, offset) aggregate."),
    "a2_weighted" -> ("Weighted zonal mean: decimal-exact Σwv/Σw in " +
      "one zone-keyed exchange with map-side partials."),
    "a4_zscore" -> ("Climatology z-score: the per-(cell, day-of-year) " +
      "climatology aggregate joins back on the SAME key — the second " +
      "pass reuses the first's partitioning."),
    "quantized_rerank_topk" -> ("Quantized ANN + rerank: int8 " +
      "candidate scan prunes to k' rows, the float rerank joins only " +
      "that bounded candidate set — full-precision vectors never " +
      "shuffle corpus-wide."),
    "lsh_ann" -> ("LSH ANN probe: per-band bucket equi-join between " +
      "query and corpus signatures; buckets grow with the corpus so " +
      "the join is shuffle-hash, never broadcast."),
    "dup_spans" -> ("Span-level dup audit: 8-gram posting self-join " +
      "with doc-frequency cap — hot shingles cannot explode the " +
      "pair fanout."),
    "edit_distance" -> ("Bounded Levenshtein: the quadratic-per-pair " +
      "kernel runs ONLY on the persisted J≥0.5 candidate pairs — " +
      "pair generation (the scale risk) is the shared LSH pipeline, " +
      "not an all-pairs join."),
    "zorder_key" -> ("Z-order clustering key: stateless bit-interleave " +
      "projection (codegen, no exchange); the layout write sorts " +
      "WITHIN partitions only."),
    "bloom_membership" -> ("Bloom decontamination: the <=m-row filter " +
      "BROADCASTS onto the probe side; only (id, position) pairs " +
      "reach the per-id aggregate — the text column never shuffles."),
    "contamination_score" -> ("Graded contamination: both sides fold " +
      "to DISTINCT (doc, shingle) rows before the shuffle-hash " +
      "overlap join (multiplicity <=1 by construction — no posting " +
      "blowup, no df cap needed)."),
    "rollup_agg" -> ("ROLLUP via leaf re-aggregation: one full-data " +
      "aggregate to the finest leaf, then the grouping-set fanout " +
      "(explode) multiplies LEAF-sized rows only — the builtin " +
      "Expand-over-the-scan (3x scan-side CPU) is gone; algebraic " +
      "re-fold keeps decimal-exact sums bit-identical."),
    "cross_corpus_dedup" -> ("Cross-corpus dedup: two-sided shingle " +
      "posting equi-join between the new and reference corpora " +
      "(shuffle-hash — neither side broadcasts), size aggregates per " +
      "side, per-new-doc best match via a doc-keyed row_number window " +
      "(type-agnostic in the id column; partition lists are " +
      "threshold-bounded, so no window partition grows with the " +
      "corpus — and no global sort)."),
    "salted_join" -> ("Skew-salted join: the hot fact key gains a " +
      "salt from the row's own unique key, the dimension side " +
      "EXPLODES x8 (dimension-sized, cheap) — the skewed key's rows " +
      "spread over 8 partitions instead of one straggler task."),
    "targeted_delete" -> ("GDPR-style targeted delete (workflow: the " +
      "dumped plan is the survivor read-back): deletion keys SEMI-join " +
      "the partition column set first, so only TOUCHED partitions " +
      "rewrite — the rewrite cost scales with the hit set, not the " +
      "table; untouched files stay byte-identical (PlanShapeSpec)."),
    "incremental_rollup" -> ("Incremental rollup maintenance " +
      "(workflow: the dumped plan is the final read-back): the delta " +
      "aggregates ALONE (one small exchange) and full-outer-merges " +
      "into the served rollup on the group key — maintenance cost " +
      "tracks the delta, while the oracle recomputes from scratch."),
    "a5_profile" -> ("Column profiling: every per-column stat folds in " +
      "ONE pass over the table (single aggregate, no per-column " +
      "scans); output is bounded by column count."),
    "approx_quantile" -> ("Mergeable quantile sketch: partial " +
      "percentile_approx buffers combine map-side; one bounded-row " +
      "exchange regardless of data size."),
    "dup_coverage" -> ("Span-dup coverage: the 8-gram posting " +
      "self-join (df-capped) folds to per-doc duplicated-token " +
      "counts; the coverage ratio is a stateless projection over " +
      "ONE doc-keyed aggregate."),
    "source_overlap" -> ("Cross-source overlap: DISTINCT (source, " +
      "shingle) before the source-pair join — multiplicity <=1 per " +
      "side caps the fanout at the true overlap size."),
    "quality_percentile_filter" -> ("Quality floor: the per-source " +
      "percentile threshold table is source-count-sized and " +
      "broadcasts back onto the corpus — one aggregate exchange, one " +
      "broadcast join, no window over the corpus."),
    "repetition_ratio" -> ("Top-shingle repetition: shingle explode " +
      "feeds two stacked doc-keyed aggregates (count, then max/sum) " +
      "— the second reuses the first's partitioning, no join."),
    "rolling_median" -> ("Rolling exact median: per-(zone) window " +
      "sorts ride ONE exchange; the frame is row-bounded so state " +
      "per key is constant."),
    "ann_probe_sweep" -> ("Recall-vs-nprobe curve: ONE probe join at " +
      "max nprobe + one window pass derives every curve point " +
      "(probe sets nest under one ordering); the exact top-k joins " +
      "the swept results on (nprobe, query, neighbor) — every join " +
      "keyed, candidate sets k-bounded per query."),
    "ann_recall_eval" -> ("ANN recall eval: brute-force truth is " +
      "query-bounded (small query set x corpus scan), the IVF side " +
      "prunes to probed clusters; the recall join is (query, " +
      "neighbor)-keyed."),
    "multimodal_meta" -> ("Multimodal metadata extraction: " +
      "mapPartitions decode (no Expression form exists for codecs) " +
      "with pruned binary column read; stateless per-row — no " +
      "exchange at all."),
    "image_resize" -> ("Image resize: same mapPartitions decode " +
      "shape — per-row pixel work, zero shuffle; output geometry is " +
      "a pure function of the input row."),
    // ---- r10: remaining members of the >=1 s sequential tier ----
    "jdbc_roundtrip" -> ("Relational sink roundtrip (workflow: the " +
      "dumped plan is the JDBC read-back): the write side stages the " +
      "DataFrame distributed (CSV parts) and hands Derby ONE bulk " +
      "import per part — write cost is the parquet scan + text " +
      "encode, linear and partition-parallel; the embedded store is " +
      "single-node BY CONTRACT (it is the reference's declared sink " +
      "shape), so the sink, not Spark, is the scale boundary."),
    "duckdb_roundtrip" -> ("Single-file analytical store roundtrip " +
      "(workflow; dumped plan is the JDBC read-back): distributed " +
      "parquet staging + ONE native read_parquet bulk statement — " +
      "the same stage-then-bulk-load idiom a warehouse COPY uses; " +
      "per-row JDBC inserts never touch the hot path."),
    "hll_distinct" -> ("HLL error-contract check: input pre-DISTINCTs " +
      "on (flag, key) — one exchange — then the rsd-sized sketch and " +
      "the exact count fold over distinct pairs only; the " +
      "mixed-aggregate Expand (which doubles every scan row) is " +
      "gone. Sketch partials merge by register: map-side combine, " +
      "bounded rows after the first aggregate."),
    "bpe_segment" -> ("BPE encode: merges learn on the WORD HISTOGRAM " +
      "(vocabulary-sized, not corpus-sized); encoding is " +
      "mapPartitions over a broadcast rank table (rank-pointer " +
      "scan, no joins) — the corpus is touched exactly once, " +
      "stateless per row."),
    "bpe_learn" -> ("BPE merge learning: the corpus is touched ONCE, " +
      "by a single word-histogram aggregate (one exchange, " +
      "vocabulary-sized output); every merge round then runs on the " +
      "driver over that histogram — O(vocab · word-length) per " +
      "round, independent of corpus row count, candidate-pool " +
      "collect bounded (limit(pool+1), Bpe.scala). The result is a " +
      "LocalRelation of merges; at 100 TB the histogram shrinks " +
      "relative to the corpus (vocabulary saturates), so the " +
      "driver loop's input is effectively constant-sized."),
    "stream_sliding_sum" -> ("Sliding-window streaming sum (dumped " +
      "plan: batch read-back of the AvailableNow drain): overlapping " +
      "windows explode per event into window-keyed partial state; " +
      "state store is keyed by (window, key) so parallelism tracks " +
      "key cardinality, and the watermark bounds retained state."),
    "stream_session_agg" -> ("Streaming session windows: " +
      "session-gap merge state keyed by user — state size tracks " +
      "ACTIVE sessions (watermark-expired sessions evict), not " +
      "history; the drain is checkpointed AvailableNow."),
    "stream_outer_join" -> ("Stream-stream LEFT OUTER join: both " +
      "sides shuffle on the join key into the state store; " +
      "watermarks bound both buffers, and the null-extension emits " +
      "exactly at watermark expiry — state is interval-bounded, " +
      "never history-bounded."),
    "stream_full_outer_join" -> ("Stream-stream FULL OUTER join: " +
      "same keyed state-store shape with BOTH sides' unmatched rows " +
      "emitted on expiry; the watermark is the state bound."),
    "stream_interval_join" -> ("Stream-stream interval join: the " +
      "time-range predicate rides a keyed equi-join; state retention " +
      "is the interval width per key — constant per key as the " +
      "stream grows."),
    "stream_cdc_merge" -> ("Streaming CDC upsert: per-key " +
      "last-write-wins via flatMapGroupsWithState keyed by the " +
      "primary key — state is one row per LIVE key; deletes " +
      "tombstone and evict."),
    "stream_scd2" -> ("Streaming SCD2: per-key ordered fold in " +
      "flatMapGroupsWithState emits close+open row pairs per " +
      "change — state per key is the single OPEN version, history " +
      "lives only in the sink."),
    "stream_running_totals" -> ("Streaming running totals: " +
      "mapGroupsWithState keyed by entity holds one accumulator row " +
      "per key — output is deltas, state never grows with events."),
    "stream_ivf_ingest" -> ("Streaming IVF ingest: new vectors " +
      "assign to their nearest centroid in a stateless map over the " +
      "broadcast centroid table (k rows), then append " +
      "cluster-partitioned — index maintenance without rebuilds, no " +
      "shuffle beyond the partitioned write."),
    "stream_shard_manifest" -> ("Streaming shard manifest: the " +
      "per-shard aggregate folds incrementally in state keyed by " +
      "shard id (numShards keys TOTAL — bounded state by " +
      "construction); the batch twin's manifest law is asserted " +
      "equal in the spec."))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the headline queries\n\n")
    sb.append("Generated by `graft.PlanDump` at sf0.01 (plans are\n")
    sb.append("shape-stable across SFs; AQE may further improve them at\n")
    sb.append("runtime). Each section: why this plan survives a 1000-\n")
    sb.append("executor scale-up, then `explain(\"formatted\")`.\n")
    headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$why\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"PLANS.md: ${headline.size} plans")
    spark.stop()
  }
}
