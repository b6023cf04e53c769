package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryGroup, Tables}
import graft.functions.Exact
import graft.streaming.StreamOps

/** The streaming surface (SURVEY §2.9) under the driver's DuckDB oracle.
  *
  * The reference is batch-with-incremental-re-runs (skip-if-exists,
  * date-partitioned append dirs —
  * /root/reference/pipelines/cdl/download-national-30m-2008-2025.yml:22-23);
  * its streaming analog here is a checkpointed AvailableNow drain: a real
  * file-source STREAM over the staged events parquet, the watermarked
  * tumbling-day aggregation, an exactly-once parquet file sink, then a
  * read-back of the committed files. Deterministic end to end, so the
  * batch GROUP BY is a valid oracle — this is what turns §2.9 from
  * spec-asserted into driver-verified.
  *
  * Append-mode emission semantics ARE part of the contract being
  * verified: a window is emitted only once the watermark (max event time
  * minus delay; delay 0 here) passes its end, so the day containing
  * max(ts) stays in state when the drain finishes and is absent from the
  * sink. The oracle applies the same cutoff (`day < day-of-max-ts`).
  */
object StreamingQueries extends QueryGroup {

  /** ONE isolated sub-session per outer session, shared by every drain
    * (shared SparkContext, own SQLConf): stateful streaming ops create
    * one state store per shuffle partition PER micro-batch, and at this
    * input size 32 partitions are pure overhead — 4 keeps drains snappy
    * without touching the shared session's conf (results are
    * partitioning-independent: decimal sums; measured on the daily-agg
    * drain: 2.5 s at 8 partitions → 1.8 s at 4, flat below that — the
    * no-data watermark-flush batch pays one state-store load+commit per
    * partition, so partitions beyond the state size are pure fixed
    * cost). Shared rather than
    * per-drain because SessionState construction (analyzer, optimizer,
    * listener bus wiring) is a per-query constant that nine sequential
    * drains would otherwise pay nine times; concurrent streams on one
    * session are a supported first-class shape (each query has its own
    * checkpoint + run id). At real scale the caller sizes the
    * partition count up like any shuffle. */
  private val subSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()
  private def streamSession(spark: SparkSession): SparkSession =
    subSessions.computeIfAbsent(spark, s => {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "4"))
      // SPARK_GRAFT_STREAM_STATESTORE (experiment knob, r12 ask #3):
      // "rocksdb" swaps the per-partition state store for the RocksDB
      // provider; anything else is passed through as a provider class
      // name. Measured on the 18-drain battery at sf0.1, alternating
      // runs (see PLANS.md r13 entry): HDFS 34.7/44.6 s vs RocksDB
      // 43.8/39.4 s — indistinguishable inside the window band at
      // KB-scale state, so the default stays HDFS; the knob remains
      // for genuinely large state (the 100 TB shape, where the HDFS
      // provider's full-snapshot uploads lose to RocksDB changelogs).
      sys.env.get("SPARK_GRAFT_STREAM_STATESTORE").foreach { v =>
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          if (v == "rocksdb")
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
          else v)
      }
      ss
    })

  /** Scratch roots are per-(app, sfDir) and wiped per invocation: the
    * drain must re-run from a clean checkpoint each time or
    * AvailableNow would correctly resume-and-skip (the idempotence the
    * sink guarantees, but not what a fresh correctness run wants to
    * measure). The application id keeps concurrent JVMs on the same
    * dataset from wiping each other's in-flight drains. */
  private def scratch(spark: SparkSession, dir: String,
                      name: String): java.nio.file.Path = {
    val safe = spark.sparkContext.applicationId + "_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_${name}_$safe")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(p.toFile)
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** Stage a table's data files into `root/in` for a file-stream
    * source (the source watches a DIRECTORY — exactly the reference's
    * staged-download-dir shape: a file "arrives", the drain picks it
    * up). The table may be a single parquet file (driver testdata) or
    * a directory of part files (any real lake layout, incl.
    * ScaleData's scaled corpora) — every data file is staged either
    * way. */
  private def stageTable(dir: String, table: String,
                         root: java.nio.file.Path): java.nio.file.Path = {
    val stage = root.resolve("in")
    java.nio.file.Files.createDirectories(stage)
    val src = java.nio.file.Paths.get(s"$dir/$table.parquet")
    if (java.nio.file.Files.isDirectory(src)) {
      val parts = src.toFile.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      require(parts.nonEmpty, s"no parquet part files under $src")
      parts.foreach(f => java.nio.file.Files.copy(
        f.toPath, stage.resolve(f.getName)))
    } else {
      java.nio.file.Files.copy(src, stage.resolve(s"$table.parquet"))
    }
    stage
  }

  /** The staged event stream, normalized: ns-timestamp → TimestampType
    * (same as Tables.events) and `value` pre-cast to decimal(30,10) so
    * the streamed sums are order-independent ([[Exact]]). */
  private def stagedEventStream(spark: SparkSession, dir: String,
                                root: java.nio.file.Path): DataFrame = {
    val stage = stageTable(dir, "events", root)
    val ss = streamSession(spark)
    // file-source streams cannot infer schemas: reuse the batch read's
    // — resolved on the OUTER session (Tables.load caches per session;
    // keying on the sub-session would re-read footers per table)
    val schema = Tables.load(spark, dir, "events").schema
    val raw = StreamOps.fileStream(ss, stage.toString, schema)
    Tables.normalizeEventTs(raw)
      .withColumn("value", col("value").cast(Exact.DecimalT))
  }

  /** Tumbling per-day aggregate per event_type, streamed: readStream →
    * [[StreamOps.tumblingDailyAgg]] → checkpointed parquet sink
    * (AvailableNow) → read back. Mean is derived from the exact sum at
    * read-back with one double division, matching the oracle's davg
    * form. */
  def streamDailyAgg(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_daily")
    val evs = stagedEventStream(spark, dir, root)
    val agg = StreamOps.tumblingDailyAgg(evs, "ts", "event_type", "value",
      watermark = "0 seconds")
    StreamOps.toParquetSink(agg, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
      .select(to_date(col("day_start")).as("day"), col("event_type"),
        col("n"),
        col("total").cast("double").as("total"),
        (col("total").cast("double") / col("n")).as("mean"))
  }

  /** Sliding 7-day/1-day window sums, streamed — the streaming form of
    * W1's trailing rolling sums, under the same AvailableNow drain
    * harness. Append emission holds back every window whose end lies
    * beyond the final watermark; the oracle regenerates the slide grid
    * (epoch-aligned daily starts, 7 per event) and applies the same
    * end-≤-max-day cutoff. */
  def streamSlidingSum(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_sliding")
    val evs = stagedEventStream(spark, dir, root)
    val agg = StreamOps.slidingSum(evs, "ts", "event_type", "value",
      windowDays = 7, watermark = "0 seconds")
    StreamOps.toParquetSink(agg, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
      .select(to_date(col("window_start")).as("window_start"),
        to_date(col("window_end")).as("window_end"), col("event_type"),
        col("total").cast("double").as("total"))
  }

  /** Session windows, streamed — the third windowed form under the
    * drain harness. Spark merges two events into one session iff their
    * gap is STRICTLY less than the gap duration (windows are
    * half-open), and a session's end is last-event + gap; the oracle's
    * gaps-and-islands uses the same strict rule and the same
    * end-≤-max-event cutoff for append emission. Timestamps emitted as
    * epoch ms (never raw ts — ns/µs mismatch across engines). */
  def streamSessionAgg(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_session")
    val evs = stagedEventStream(spark, dir, root)
    val agg = StreamOps.sessionAgg(evs, "ts", "user_id", "value",
      gap = "30 minutes", watermark = "0 seconds")
    StreamOps.toParquetSink(agg, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
      .select(col("user_id"),
        expr("unix_micros(session_start) div 1000").as("start_ms"),
        expr("unix_micros(session_end) div 1000").as("end_ms"),
        col("n"),
        col("total").cast("double").as("total"))
  }

  /** Watermarked stream-stream interval join (the attribution shape:
    * purchase ≤ 1 h after a same-user click), drained. A streaming
    * INNER join emits each pair the moment both rows are present —
    * watermarks only bound retained state, never hold back matches —
    * so a full AvailableNow drain equals the batch join exactly and
    * the oracle is the plain interval-join SQL, no cutoff needed. */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_ijoin")
    val evs = stagedEventStream(spark, dir, root)
    def side(t: String) = evs.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"))
    val joined = StreamOps.intervalJoin(side("click"), side("purchase"),
      "user_id", "ts", "ts", maxDelay = "1 hour")
    val out = joined.select(col("user_id"),
      col("event_id").as("click_id"),
      expr("unix_micros(ts) div 1000").as("click_ms"),
      col("r_event_id").as("purchase_id"),
      expr("unix_micros(r_ts) div 1000").as("purchase_ms"))
    StreamOps.toParquetSink(out, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Watermarked stream-stream LEFT OUTER interval join, drained: the
    * attribution shape again, but clicks with NO purchase within the
    * hour surface as null-augmented rows — the unconverted-traffic side
    * an inner join silently drops. Outer emission is watermark-GATED:
    * a null row may only emit once the watermark proves no matching
    * purchase can still arrive (left-state eviction), so the drain's
    * final `maxDelay` of unmatched clicks stays in state and is absent
    * from the sink. That gate is deterministic — watermark delay 0, so
    * the final watermark is min(max click ts, max purchase ts) over the
    * drained input (each side's watermark node sits after its filter),
    * Spark tracks it in WHOLE MILLISECONDS — and the oracle reproduces
    * exactly it: matched rows unconditionally, unmatched clicks iff
    * click_ms + 1 h < watermark_ms. */
  def streamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_ojoin")
    val evs = stagedEventStream(spark, dir, root)
    def side(t: String) = evs.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"))
    val joined = StreamOps.intervalJoin(side("click"), side("purchase"),
      "user_id", "ts", "ts", maxDelay = "1 hour",
      watermark = "0 seconds", joinType = "left_outer")
    val out = joined.select(col("user_id"),
      col("event_id").as("click_id"),
      expr("unix_micros(ts) div 1000").as("click_ms"),
      col("r_event_id").as("purchase_id"),
      expr("unix_micros(r_ts) div 1000").as("purchase_ms"))
    StreamOps.toParquetSink(out, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** FULL OUTER stream-stream interval join, drained: both unmatched
    * sides surface — clicks that never converted AND purchases with no
    * qualifying prior click. Each side's null-augmented rows are gated
    * by ITS OWN state eviction: unmatched clicks need the watermark
    * past click + maxDelay (as in [[streamOuterJoin]]); unmatched
    * purchases need it past the purchase time itself (a purchase can
    * only match clicks in [p − 1 h, p], so its state expires once the
    * watermark passes p). Same millisecond-floored min-of-sides final
    * watermark; both gates reproduced in the oracle. */
  def streamFullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_fojoin")
    val evs = stagedEventStream(spark, dir, root)
    def side(t: String) = evs.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"))
    val joined = StreamOps.intervalJoin(side("click"), side("purchase"),
      "user_id", "ts", "ts", maxDelay = "1 hour",
      watermark = "0 seconds", joinType = "full_outer")
    val out = joined.select(
      coalesce(col("user_id"), col("r_user_id")).as("user_id"),
      col("event_id").as("click_id"),
      expr("unix_micros(ts) div 1000").as("click_ms"),
      col("r_event_id").as("purchase_id"),
      expr("unix_micros(r_ts) div 1000").as("purchase_ms"))
    StreamOps.toParquetSink(out, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Streaming duplicate suppression, drained: WHICH physical row
    * survives a duplicate group is arrival-order-dependent (not
    * verifiable cross-engine), but the op's contract — every distinct
    * key emitted exactly once — is deterministic, so the query projects
    * the dedup key columns and the oracle is SELECT DISTINCT. First-
    * seen rows emit immediately in append mode (the watermark only
    * bounds retained state), so no cutoff applies. The one-file stage
    * drains as a single micro-batch (watermark advances only BETWEEN
    * batches), so the dedup horizon deterministically spans the whole
    * input regardless of the watermark delay. */
  def streamDedupKeys(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_dedup")
    val evs = stagedEventStream(spark, dir, root)
    val deduped = StreamOps.dedupedStream(
      evs.select(col("ts"), col("user_id"), col("event_type")),
      "ts", idCol = "user_id", watermark = "1 day")
    StreamOps.toParquetSink(deduped.select(col("user_id")),
      s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** The corpus-cleaning battery run INCREMENTALLY: documents arrive as
    * a file stream (the staged-download shape a crawling pipeline
    * produces) and the full quality battery — tokenization, stopword
    * ratio, language ID, verdict — evaluates per micro-batch as pure
    * stateless projections (all codegen, no state store), drained
    * through the checkpointed sink. Stateless append emits every row
    * immediately, so the drain equals the batch query exactly and the
    * oracle is quality_filter's own SQL. This is the shape a 100 TB/day
    * ingest actually runs: clean-on-arrival, not clean-after-landing. */
  def streamQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_quality")
    val stage = stageTable(dir, "documents", root)
    val ss = streamSession(spark)
    val schema = Tables.load(spark, dir, "documents").schema
    val docs = StreamOps.fileStream(ss, stage.toString, schema)
    val scored = TextQueries.qualityVerdict(docs)
    StreamOps.toParquetSink(scored, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Bloom decontamination ON ARRIVAL: the filter built batch-side
    * over the benchmark slice collapses to a literal position set
    * (≤ m = 4096 ints — [[graft.operators.Bloom.memberExpr]]'s
    * driver-sized-constant contract, the broadcast analog for
    * streams) and every arriving document gets its verdict in a PURE
    * PROJECTION — no join, no state store, codegen end to end.
    * Stateless append emits rows immediately, so the drain equals the
    * batch [[CorpusQueries.bloomMembership]] bit-for-bit and the
    * oracle is bloom_membership's SQL verbatim. This is the shape a
    * 100 TB/day ingest runs: the benchmark filter ships to the edge,
    * contaminated docs are flagged before they ever land. */
  def streamBloomProbe(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_bloom")
    val stage = stageTable(dir, "documents", root)
    val ss = streamSession(spark)
    val schema = Tables.load(spark, dir, "documents").schema
    // bounded collect: a build() result is ≤ m = 4096 position ints
    val bits = graft.operators.Bloom.build(
        ss.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 19 === 0), col("text"), k = 4, m = 4096)
      .collect().map(_.getInt(0)).toSeq
    val docs = StreamOps.fileStream(ss, stage.toString, schema)
    val out = docs.select(col("doc_id"),
      graft.operators.Bloom.memberExpr(col("text"), bits, k = 4, m = 4096)
        .cast("int").as("maybe_member"))
    StreamOps.toParquetSink(out, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Bounded-state k-per-group sampling run INCREMENTALLY
    * ([[StreamOps.boundedGroupSample]]): documents arrive as a file
    * stream and each source's k-smallest-salted-hash sample is
    * maintained in k-row state — the always-current inspection sample a
    * 100 TB/day ingest keeps without rescanning. min-k of the salted
    * hash is order-insensitive, so the drained final state equals the
    * batch [[TextQueries.groupSample]] cut bit-for-bit and the oracle
    * is group_sample's SQL verbatim. Update-mode drain; read-back
    * recovers each group's final sample via max_by(ids, n_seen), then
    * ranks by array position (the ids are emitted in rank order). */
  def streamGroupSample(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_gsample")
    val stage = stageTable(dir, "documents", root)
    val ss = streamSession(spark)
    val schema = Tables.load(spark, dir, "documents").schema
    val docs = StreamOps.fileStream(ss, stage.toString, schema)
    val agg = StreamOps.boundedGroupSample(ss, docs, "source", "doc_id",
      k = 20)
    StreamOps.toParquetSinkUpdates(agg, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
      .groupBy("source")
      .agg(max_by(col("ids"), col("n_seen")).as("ids"))
      .select(col("source"), posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select(col("doc_id"), col("source"),
        (col("pos") + 1).cast("int").as("sample_rank"))
  }

  /** Continuous-ingest dedup against a historical corpus
    * ([[StreamOps.dedupAgainstCorpus]]): documents arrive as a file
    * stream and pass only if their exact-text md5 is absent from the
    * static fingerprint index (docs with doc_id % 7 = 0 play the
    * already-ingested corpus). Stateless LEFT ANTI stream-static join —
    * append mode, no state store — so the drained sink equals the batch
    * anti-join verbatim; the corpus's real exact-dup texts make the
    * filter bite beyond the carved slice itself. */
  def streamCorpusDedup(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_corpus_dedup")
    val stage = stageTable(dir, "documents", root)
    val ss = streamSession(spark)
    val schema = Tables.load(spark, dir, "documents").schema
    val docs = StreamOps.fileStream(ss, stage.toString, schema)
    val hist = ss.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 7 === 0)
    val fresh = StreamOps.dedupAgainstCorpus(docs, hist)
      .select("doc_id", "source")
    StreamOps.toParquetSink(fresh, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Incremental shard manifest ([[graft.operators.Shard]] columns
    * under a streaming aggregate): as documents arrive, the per-shard
    * doc/token/char totals stay current in numShards rows of state —
    * the trainer sidecar maintained DURING ingest instead of recomputed
    * after. Sums/counts are order-insensitive and the shard key is
    * stateless, so the drained final state equals the batch
    * [[CorpusQueries.shardManifest]] bit-for-bit (same oracle verbatim);
    * Update-mode drain recovered via the monotone-n_docs struct max. */
  def streamShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_manifest")
    val stage = stageTable(dir, "documents", root)
    val ss = streamSession(spark)
    val schema = Tables.load(spark, dir, "documents").schema
    val docs = StreamOps.fileStream(ss, stage.toString, schema)
    val agg = docs.filter(col("doc_id").isNotNull)
      .select(
        graft.operators.Shard.shardOf(col("doc_id"), 8).as("shard"),
        size(split(trim(lower(col("text"))), "[ \\t\\n\\r]+")).cast("long")
          .as("n_tok"),
        col("n_chars"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum("n_chars").as("n_chars"))
    StreamOps.toParquetSinkUpdates(agg, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
      .groupBy("shard")
      .agg(max(struct(col("n_docs"), col("n_tokens"), col("n_chars")))
        .as("m"))
      .select(col("shard"), col("m.n_docs").as("n_docs"),
        col("m.n_tokens").as("n_tokens"), col("m.n_chars").as("n_chars"))
  }

  /** Stateless streaming IVF-index ingest
    * ([[StreamOps.ivfIngest]]): embeddings arrive as a file stream and
    * each is assigned to its nearest centroid of an index TRAINED ON
    * THE HISTORICAL SLICE (even vec_ids) — the centroid set rides the
    * plan as literals, so the query is a pure projection (no state, no
    * stream-side shuffle). Assignment is a pure function of the
    * vector, so the drain equals the batch assignment however the
    * input was micro-batched; the oracle re-derives the train-slice
    * k-means in SQL and assigns every vector against it. */
  def streamIvfIngest(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_ivf")
    val stage = stageTable(dir, "embeddings", root)
    val ss = streamSession(spark)
    val hist = ss.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.asDouble(col("embedding")).as("vec"))
    val cents = graft.operators.Ivf.train(hist, k = 8, iters = 1)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val schema = Tables.load(spark, dir, "embeddings").schema
    val vecs = StreamOps.fileStream(ss, stage.toString, schema)
      .select(col("vec_id").as("id"),
        graft.operators.Similarity.asDouble(col("embedding")).as("vec"))
    val assigned = StreamOps.ivfIngest(vecs, cents)
    StreamOps.toParquetSink(assigned, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Stream-STATIC enrichment join — the remaining join mode of the
    * streaming surface (stream-stream is `stream_interval_join`): each
    * arriving event joins the static customer dimension statelessly (no
    * state store, no watermark — the static side is simply read per
    * micro-batch, broadcast by AQE when small). Append emits every
    * match immediately, so the drain equals the batch join and the
    * oracle is plain SQL. This is the canonical 100 TB ingest-enrich
    * shape: facts stream in, dimensions sit still. */
  def streamEnrichJoin(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_enrich")
    val evs = stagedEventStream(spark, dir, root)
    val ss = evs.sparkSession
    val dim = ss.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val enriched = evs
      .join(dim, evs("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("c_mktsegment"),
        // stagedEventStream pre-casts value to the exact-sum decimal;
        // this join aggregates nothing, so hand back the source double
        col("value").cast("double").as("value"))
    StreamOps.toParquetSink(enriched, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** Keyed running totals (mapGroupsWithState), drained: the custom-
    * state surface under the oracle. The state sums are exact decimal
    * ([[StreamOps.runningTotals]]), so the FINAL state per key equals a
    * batch GROUP BY bit-for-bit; Update-mode drains append one row per
    * (key, batch), and the monotone event count picks the final one via
    * max(struct(n, total)) — replay/duplicate-safe. */
  def streamRunningTotals(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_totals")
    val evs = stagedEventStream(spark, dir, root)
    val totals = StreamOps.runningTotals(evs.sparkSession, evs,
      "user_id", "value")
    StreamOps.toParquetSinkUpdates(totals, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("total_value"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.total_value").cast("double").as("total_value"))
  }

  /** Threshold-crossing alerts (flatMapGroupsWithState), drained: the
    * 0..n-output custom-state surface under the oracle. With the
    * non-negative `value` filter the running total is monotone, so the
    * union of every batch's emitted levels is exactly
    * `1..floor(total/500)` per user — batch-count-independent, which is
    * what makes the alert SET a cross-engine contract
    * ([[StreamOps.thresholdAlerts]] computes floor on the double cast of
    * the exact decimal total, the same IEEE ops the oracle runs). */
  def streamThresholdAlerts(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_alerts")
    val evs = stagedEventStream(spark, dir, root)
      .filter(col("value") >= 0)
    val alerts = StreamOps.thresholdAlerts(evs.sparkSession, evs,
      "user_id", "value", threshold = 500.0)
    StreamOps.toParquetSink(alerts, s"$root/out", s"$root/ckpt")
    spark.read.parquet(s"$root/out")
  }

  /** CDC changelog → keyed-dataset merge (foreachBatch), driver-
    * verified: seed a keyed parquet snapshot (even order keys at their
    * current price), stream a changelog (every third key re-priced
    * +1000) through [[StreamOps.foreachBatchMerge]], read the merged
    * dataset back. Last-write-wins per key: updated keys carry the
    * changelog row, untouched seed keys survive, new keys append —
    * the streaming form of the O8 catalog upsert
    * (/root/reference/pipelines/tiger/county.yml:65-72). */
  def streamCdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_cdc")
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val target = s"$root/target"
    orders.filter(col("o_orderkey") % 2 === 0).write.parquet(target)
    val stage = root.resolve("in").toString
    orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .write.parquet(stage)
    val ss = streamSession(spark)
    val changelog = StreamOps.fileStream(ss, stage, orders.schema)
    StreamOps.foreachBatchMerge(changelog, target, s"$root/ckpt",
      keys = Seq("o_orderkey"))
    spark.read.parquet(target)
  }

  /** Incremental SCD2 dimension maintenance, streamed
    * ([[StreamOps.scd2Changes]]): the change-point rows are detected
    * statefully as events arrive (the hard part — remembering each
    * user's last attribute), committed append-only, and the validity
    * close-out (eff_to, is_current) derives at read-back with lead()
    * over the committed rows — each user's OPEN interval lives in
    * state, never in an emitted row. The one-file drain is a single
    * batch, so per-key arrival order is the sorted (us, id) order and
    * the committed set equals the batch change-point set: the oracle is
    * scd2_build's own SQL, verbatim. */
  def streamScd2(spark: SparkSession, dir: String): DataFrame = {
    val root = scratch(spark, dir, "stream_scd2")
    val evs = stagedEventStream(spark, dir, root)
    val prepared = evs.select(col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"), col("event_id"))
    val changes = StreamOps.scd2Changes(evs.sparkSession, prepared,
      "user_id", "event_type", "us", "event_id")
    StreamOps.toParquetSink(changes, s"$root/out", s"$root/ckpt")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    spark.read.parquet(s"$root/out")
      .withColumn("__next", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_type").as("attr"),
        expr("us div 1000").as("eff_from_ms"),
        coalesce(expr("__next div 1000"), lit(-1L)).as("eff_to_ms"),
        when(col("__next").isNull, 1).otherwise(0).cast("int")
          .as("is_current"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_scd2" -> (streamScd2 _),
    "stream_daily_agg" -> (streamDailyAgg _),
    "stream_sliding_sum" -> (streamSlidingSum _),
    "stream_session_agg" -> (streamSessionAgg _),
    "stream_interval_join" -> (streamIntervalJoin _),
    "stream_outer_join" -> (streamOuterJoin _),
    "stream_full_outer_join" -> (streamFullOuterJoin _),
    "stream_dedup_keys" -> (streamDedupKeys _),
    "stream_quality_filter" -> (streamQualityFilter _),
    "stream_bloom_probe" -> (streamBloomProbe _),
    "stream_enrich_join" -> (streamEnrichJoin _),
    "stream_running_totals" -> (streamRunningTotals _),
    "stream_group_sample" -> (streamGroupSample _),
    "stream_corpus_dedup" -> (streamCorpusDedup _),
    "stream_ivf_ingest" -> (streamIvfIngest _),
    "stream_shard_manifest" -> (streamShardManifest _),
    "stream_threshold_alerts" -> (streamThresholdAlerts _),
    "stream_cdc_merge" -> (streamCdcMerge _))

  def oracles: Map[String, String] = {
    import Exact.sql._
    Map(
      // identical to scd2_build's oracle: the streamed change-point set
      // + read-back close-out must be indistinguishable from the batch
      // build
      "stream_scd2" -> EventQueries.oracles("scd2_build"),
      // the last day (the one holding max(ts)) is held back by the
      // watermark when the AvailableNow drain ends — same cutoff here
      "stream_daily_agg" ->
        s"""SELECT CAST(ts AS DATE) AS day, event_type,
           |  COUNT(*) AS n,
           |  ${dsum("\"value\"")} AS total,
           |  ${dsum("\"value\"")} / COUNT(*) AS mean
           |FROM events
           |WHERE CAST(ts AS DATE) <
           |  (SELECT CAST(max(ts) AS DATE) FROM events)
           |GROUP BY 1, 2""".stripMargin,
      // slide grid: 7 epoch-aligned daily window starts per event; the
      // cutoff mirrors append-mode emission (window end ≤ max day)
      "stream_sliding_sum" ->
        s"""WITH ev AS (
           |  SELECT CAST(date_trunc('day', ts) - i * INTERVAL 1 DAY AS DATE)
           |    AS window_start, event_type, "value"
           |  FROM events CROSS JOIN unnest(range(0, 7)) AS t(i))
           |SELECT window_start,
           |  CAST(window_start + 7 * INTERVAL 1 DAY AS DATE) AS window_end,
           |  event_type,
           |  ${dsum("\"value\"")} AS total
           |FROM ev
           |WHERE CAST(window_start + 7 * INTERVAL 1 DAY AS DATE) <=
           |  (SELECT CAST(max(ts) AS DATE) FROM events)
           |GROUP BY 1, 2, 3""".stripMargin,
      // STRICT session merge (diff < gap same session ⇔ diff >= gap new
      // session — Spark's half-open session windows); session end =
      // last event + gap; append emission = end ≤ the final watermark,
      // which Spark tracks MILLISECOND-truncated (EventTimeWatermark
      // keeps max event time in ms) — the cutoff truncates the same way
      // or a session ending inside the last partial ms would flake
      "stream_session_agg" ->
        s"""WITH g AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us, "value",
           |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1)
           |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           |        >= 1800 * 1000000
           |      OR LAG(epoch_us(ts), 1)
           |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
           |        IS NULL
           |    THEN 1 ELSE 0 END AS gap_new
           |  FROM events),
           |s AS (
           |  SELECT user_id, us, "value",
           |    CAST(SUM(gap_new) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS session_idx
           |  FROM g),
           |agg AS (
           |  SELECT user_id, session_idx, COUNT(*) AS n,
           |    MIN(us) AS start_us, MAX(us) + 1800 * 1000000 AS end_us,
           |    ${dsum("\"value\"")} AS total
           |  FROM s GROUP BY 1, 2)
           |SELECT user_id, start_us // 1000 AS start_ms,
           |  end_us // 1000 AS end_ms, n, total
           |FROM agg
           |WHERE end_us <=
           |  (SELECT (MAX(epoch_us(ts)) // 1000) * 1000 FROM events)""".stripMargin,
      // inner joins emit on match — the drain IS the batch join
      "stream_interval_join" ->
        """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT user_id, event_id, epoch_us(ts) AS us
          |  FROM events WHERE event_type = 'purchase')
          |SELECT c.user_id, c.event_id AS click_id,
          |  c.us // 1000 AS click_ms,
          |  p.event_id AS purchase_id, p.us // 1000 AS purchase_ms
          |FROM c JOIN p ON c.user_id = p.user_id
          |  AND p.us >= c.us
          |  AND p.us <= c.us + CAST(3600 AS BIGINT) * 1000000""".stripMargin,
      // matched pairs emit on match (inner semantics); unmatched
      // clicks emit only when evicted — click + 1 h strictly below the
      // final watermark, which is min(max click, max purchase) event
      // time FLOORED TO MILLISECONDS (Spark tracks watermarks in ms)
      "stream_outer_join" ->
        """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT user_id, event_id, epoch_us(ts) AS us
          |  FROM events WHERE event_type = 'purchase'),
          |wm AS (SELECT LEAST((SELECT MAX(us) // 1000 FROM c),
          |    (SELECT MAX(us) // 1000 FROM p)) * 1000 AS w)
          |SELECT c.user_id, c.event_id AS click_id,
          |  c.us // 1000 AS click_ms,
          |  p.event_id AS purchase_id, p.us // 1000 AS purchase_ms
          |FROM c LEFT JOIN p ON c.user_id = p.user_id
          |  AND p.us >= c.us
          |  AND p.us <= c.us + CAST(3600 AS BIGINT) * 1000000
          |WHERE p.event_id IS NOT NULL
          |  OR c.us + CAST(3600 AS BIGINT) * 1000000 < (SELECT w FROM wm)"""
          .stripMargin,
      // both unmatched sides, each gated by its own eviction: clicks
      // need wm past click + 1 h; purchases past the purchase itself
      "stream_full_outer_join" ->
        """WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us
          |  FROM events WHERE event_type = 'click'),
          |p AS (SELECT user_id, event_id, epoch_us(ts) AS us
          |  FROM events WHERE event_type = 'purchase'),
          |wm AS (SELECT LEAST((SELECT MAX(us) // 1000 FROM c),
          |    (SELECT MAX(us) // 1000 FROM p)) * 1000 AS w)
          |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
          |  c.event_id AS click_id, c.us // 1000 AS click_ms,
          |  p.event_id AS purchase_id, p.us // 1000 AS purchase_ms
          |FROM c FULL JOIN p ON c.user_id = p.user_id
          |  AND p.us >= c.us
          |  AND p.us <= c.us + CAST(3600 AS BIGINT) * 1000000
          |WHERE (c.event_id IS NOT NULL AND p.event_id IS NOT NULL)
          |  OR (p.event_id IS NULL AND
          |    c.us + CAST(3600 AS BIGINT) * 1000000 < (SELECT w FROM wm))
          |  OR (c.event_id IS NULL AND p.us < (SELECT w FROM wm))"""
          .stripMargin,
      // the emitted KEY SET is the deterministic contract (see scaladoc)
      "stream_dedup_keys" ->
        "SELECT DISTINCT user_id FROM events",
      // stateless append drains the full battery — the stream equals
      // the batch query, so it shares quality_filter's oracle verbatim
      "stream_quality_filter" -> TextQueries.oracles("quality_filter"),
      // stateless projection drain == the batch bloom verdict exactly
      "stream_bloom_probe" -> CorpusQueries.oracles("bloom_membership"),
      // stateless stream-static inner join = the batch join, verbatim
      "stream_enrich_join" ->
        """SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
          |  e."value"
          |FROM events e JOIN customer c ON e.user_id = c.c_custkey"""
          .stripMargin,
      // drained k-row sample state = the batch order-statistic cut,
      // verbatim (min-k of the salted hash is order-insensitive)
      "stream_group_sample" -> TextQueries.oracles("group_sample"),
      // order-insensitive sums in bounded (numShards-row) state:
      // drained final state = the batch manifest, same oracle verbatim
      "stream_shard_manifest" -> CorpusQueries.oracles("shard_manifest"),
      // literal-centroid assignment = the batch train-slice k-means
      // chain (the VectorQueries kmeans oracle form, trained on even
      // vec_ids, assignment over ALL vectors)
      "stream_ivf_ingest" -> {
        def d2(a: String, b: String) =
          s"list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b)" +
            s" + list_dot_product($b, $b)"
        val dsumV =
          "CAST(CAST(SUM(CAST(CAST(v[i] AS VARCHAR) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"
        s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |tr AS (SELECT * FROM e WHERE id % 2 = 0),
           |init AS (
           |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) AS INT)
           |    AS cluster_id, v AS c
           |  FROM (SELECT * FROM tr ORDER BY id LIMIT 8)),
           |a0 AS (
           |  SELECT id, v, cluster_id FROM (
           |    SELECT tr.id, tr.v, i.cluster_id,
           |      ROW_NUMBER() OVER (PARTITION BY tr.id
           |        ORDER BY ${d2("tr.v", "i.c")}, i.cluster_id) AS rn
           |    FROM tr, init i) t WHERE rn = 1),
           |upd AS (
           |  SELECT cluster_id, i AS pos, $dsumV / COUNT(*) AS m
           |  FROM a0 CROSS JOIN unnest(range(1, len(v) + 1)) AS t(i)
           |  GROUP BY 1, 2),
           |cent AS (SELECT cluster_id, list(m ORDER BY pos) AS c
           |  FROM upd GROUP BY 1)
           |SELECT id, cluster_id FROM (
           |  SELECT e.id, ct.cluster_id,
           |    ROW_NUMBER() OVER (PARTITION BY e.id
           |      ORDER BY ${d2("e.v", "ct.c")}, ct.cluster_id) AS rn
           |  FROM e, cent ct) t WHERE rn = 1""".stripMargin
      },
      // stateless anti-join: admission is a pure function of the text,
      // so the drain equals the batch anti-join however it was batched
      "stream_corpus_dedup" ->
        """SELECT d.doc_id, d.source FROM documents d
          |WHERE NOT EXISTS (SELECT 1 FROM documents h
          |  WHERE h.doc_id % 7 = 0 AND md5(h.text) = md5(d.text))"""
          .stripMargin,
      // final custom state per key = plain batch GROUP BY (exact
      // decimal sums on both sides, double cast at the end)
      "stream_running_totals" ->
        s"""SELECT user_id, COUNT(*) AS n_events,
           |  ${dsum("\"value\"")} AS total_value
           |FROM events GROUP BY 1""".stripMargin,
      // alert set = levels 1..floor(total/threshold); floor runs on the
      // double cast of the same exact decimal total as the engine
      "stream_threshold_alerts" ->
        s"""WITH t AS (
           |  SELECT user_id, ${dsum("\"value\"")} AS total
           |  FROM events WHERE "value" >= 0 GROUP BY 1),
           |lv AS (
           |  SELECT user_id, unnest(range(1,
           |    CAST(floor(total / CAST(500.0 AS DOUBLE)) AS BIGINT) + 1))
           |    AS level
           |  FROM t)
           |SELECT user_id, level,
           |  level * CAST(500.0 AS DOUBLE) AS level_value
           |FROM lv""".stripMargin,
      // last-write-wins over seed ∪ changelog
      "stream_cdc_merge" ->
        """SELECT o_orderkey, o_custkey,
          |  CASE WHEN o_orderkey % 3 = 0
          |    THEN o_totalprice + CAST(1000.0 AS DOUBLE)
          |    ELSE o_totalprice END AS o_totalprice
          |FROM orders
          |WHERE o_orderkey % 2 = 0 OR o_orderkey % 3 = 0""".stripMargin)
  }
}
