package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

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
  *
  * == One multi-sink drain per generation (r13 judge ask #1) ==
  *
  * Every stream query keeps its OWN source→sink→checkpoint pipeline and
  * its own hash-checked oracle, but the drains run as ONE group: the
  * first member invoked in a "generation" stages the shared source
  * tables once, STARTS all members' streaming queries concurrently
  * (concurrent streams on one session are first-class — each has its
  * own run id, state stores and checkpoint), and awaits them together.
  * Subsequent members of the same generation read back their
  * already-committed sinks. Re-invoking a member that already consumed
  * its generation starts a FRESH generation (new scratch roots, clean
  * checkpoints — the same per-invocation re-drain contract the
  * individual queries had). The micro-batch machinery that dominates a
  * KB-state drain — state-store load+commit per partition, the
  * watermark-flush no-data batch, the file-sink metadata log — is pure
  * latency at this state size, so 18 drains in flight cost barely more
  * wall-clock than one (measured: ~23.5 s of serial drains → one group
  * drain; see BASELINE.md r14). Results are bit-identical by
  * construction: each member's plan, input, checkpoint and sink are
  * exactly what its standalone drain used — only the SCHEDULING of the
  * 18 independent queries changed, and the concurrent-battery pass has
  * always run them overlapped.
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
  // experiment knob (r14): SPARK_GRAFT_STREAM_SESSION=per gives every
  // drain-group launch thread its own sub-session (isolated SQLConf +
  // SessionState) instead of one shared one — probes whether the
  // group drain's concurrency is limited by shared-session contention
  private def streamSession(spark: SparkSession): SparkSession =
    if (sys.env.get("SPARK_GRAFT_STREAM_SESSION").contains("per"))
      perThreadSession(spark)
    else sharedSession(spark)
  private val perThreadSessions = new ThreadLocal[SparkSession]()
  private def perThreadSession(spark: SparkSession): SparkSession = {
    val cur = perThreadSessions.get()
    if (cur != null) cur
    else {
      val ss = configured(spark.newSession())
      perThreadSessions.set(ss)
      ss
    }
  }
  private def configured(ss: SparkSession): SparkSession = {
    ss.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "4"))
    sys.env.get("SPARK_GRAFT_STREAM_STATESTORE").foreach { v =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        if (v == "rocksdb")
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else v)
    }
    ss
  }
  private def sharedSession(spark: SparkSession): SparkSession =
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

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  /** Stage a table's data files into `stage` for a file-stream source
    * (the source watches a DIRECTORY — exactly the reference's
    * staged-download-dir shape: a file "arrives", the drain picks it
    * up). The table may be a single parquet file (driver testdata) or
    * a directory of part files (any real lake layout, incl.
    * ScaleData's scaled corpora) — every data file is staged either
    * way. Staged ONCE per generation and shared by every member
    * watching that table: a file-stream source dir is read-only input,
    * and each member's checkpoint tracks its own offsets into it. */
  private def stageTable(dir: String, table: String,
                         stage: java.nio.file.Path): Unit = {
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
  }

  /** The staged event stream, normalized: ns-timestamp → TimestampType
    * (same as Tables.events) and `value` pre-cast to decimal(30,10) so
    * the streamed sums are order-independent ([[Exact]]). */
  private def eventStream(spark: SparkSession, dir: String,
                          base: java.nio.file.Path): DataFrame = {
    val ss = streamSession(spark)
    // file-source streams cannot infer schemas: reuse the batch read's
    // — resolved on the OUTER session via Tables.load, whose cache is
    // keyed (session, path) and therefore DIR-correct: a second corpus
    // on the same session resolves its own schema, not the first
    // one's (keying on the sub-session would re-read footers per table)
    val schema = Tables.load(spark, dir, "events").schema
    val raw = StreamOps.fileStream(ss, base.resolve("in_events").toString,
      schema)
    Tables.normalizeEventTs(raw)
      .withColumn("value", col("value").cast(Exact.DecimalT))
  }

  private def docStream(spark: SparkSession, dir: String,
                        base: java.nio.file.Path): DataFrame = {
    val ss = streamSession(spark)
    StreamOps.fileStream(ss, base.resolve("in_documents").toString,
      Tables.load(spark, dir, "documents").schema)
  }

  /** One streaming correctness pipeline: which shared staged tables it
    * reads, how to build its drain, how to read its sink back.
    *
    * `launch` runs the member's PREP — static-side batch work (bloom
    * bits, IVF centroid training, the CDC seed write) plus building the
    * streaming DataFrame — and returns a thunk that `.start()`s the
    * drain. Two phases matter: prep jobs that run concurrently with 17
    * already-started drains queue behind their micro-batches (measured:
    * IVF's train took 7.3 s on the drain's critical path vs ~1 s with
    * the box to itself), so the group runs every prep first, THEN
    * starts all drains together. */
  private final case class Member(
      name: String,
      tables: Set[String],
      launch: (SparkSession, String, java.nio.file.Path)
        => () => StreamingQuery,
      read: (SparkSession, java.nio.file.Path) => DataFrame) {
    def out(base: java.nio.file.Path): String =
      base.resolve(name).resolve("out").toString
    def ckpt(base: java.nio.file.Path): String =
      base.resolve(name).resolve("ckpt").toString
  }

  // ---------------------------------------------------------------- //
  //  Members. Each launch/read pair is the exact pipeline the former  //
  //  standalone query ran; scaladocs preserved on the public defs.    //
  // ---------------------------------------------------------------- //

  private val memDaily: Member = Member("stream_daily_agg", Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val agg = StreamOps.tumblingDailyAgg(evs, "ts", "event_type", "value",
        watermark = "0 seconds")
      () => StreamOps.startParquetSink(agg, memDaily.out(base), memDaily.ckpt(base))
    },
    read = (spark, base) =>
      spark.read.parquet(memDaily.out(base))
        .select(to_date(col("day_start")).as("day"), col("event_type"),
          col("n"),
          col("total").cast("double").as("total"),
          (col("total").cast("double") / col("n")).as("mean")))

  private val memSliding: Member = Member("stream_sliding_sum", Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val agg = StreamOps.slidingSum(evs, "ts", "event_type", "value",
        windowDays = 7, watermark = "0 seconds")
      () => StreamOps.startParquetSink(agg, memSliding.out(base),
        memSliding.ckpt(base))
    },
    read = (spark, base) =>
      spark.read.parquet(memSliding.out(base))
        .select(to_date(col("window_start")).as("window_start"),
          to_date(col("window_end")).as("window_end"), col("event_type"),
          col("total").cast("double").as("total")))

  private val memSession: Member = Member("stream_session_agg", Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val agg = StreamOps.sessionAgg(evs, "ts", "user_id", "value",
        gap = "30 minutes", watermark = "0 seconds")
      () => StreamOps.startParquetSink(agg, memSession.out(base),
        memSession.ckpt(base))
    },
    read = (spark, base) =>
      spark.read.parquet(memSession.out(base))
        .select(col("user_id"),
          expr("unix_micros(session_start) div 1000").as("start_ms"),
          expr("unix_micros(session_end) div 1000").as("end_ms"),
          col("n"),
          col("total").cast("double").as("total")))

  private def joinSides(spark: SparkSession, dir: String,
                        base: java.nio.file.Path)
      : (DataFrame, DataFrame) = {
    val evs = eventStream(spark, dir, base)
    def side(t: String) = evs.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"))
    (side("click"), side("purchase"))
  }

  private val memIJoin: Member = Member("stream_interval_join",
    Set("events"),
    launch = (spark, dir, base) => {
      val (c, p) = joinSides(spark, dir, base)
      val joined = StreamOps.intervalJoin(c, p,
        "user_id", "ts", "ts", maxDelay = "1 hour")
      val out = joined.select(col("user_id"),
        col("event_id").as("click_id"),
        expr("unix_micros(ts) div 1000").as("click_ms"),
        col("r_event_id").as("purchase_id"),
        expr("unix_micros(r_ts) div 1000").as("purchase_ms"))
      () => StreamOps.startParquetSink(out, memIJoin.out(base), memIJoin.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memIJoin.out(base)))

  private val memOJoin: Member = Member("stream_outer_join", Set("events"),
    launch = (spark, dir, base) => {
      val (c, p) = joinSides(spark, dir, base)
      val joined = StreamOps.intervalJoin(c, p,
        "user_id", "ts", "ts", maxDelay = "1 hour",
        watermark = "0 seconds", joinType = "left_outer")
      val out = joined.select(col("user_id"),
        col("event_id").as("click_id"),
        expr("unix_micros(ts) div 1000").as("click_ms"),
        col("r_event_id").as("purchase_id"),
        expr("unix_micros(r_ts) div 1000").as("purchase_ms"))
      () => StreamOps.startParquetSink(out, memOJoin.out(base), memOJoin.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memOJoin.out(base)))

  private val memFOJoin: Member = Member("stream_full_outer_join",
    Set("events"),
    launch = (spark, dir, base) => {
      val (c, p) = joinSides(spark, dir, base)
      val joined = StreamOps.intervalJoin(c, p,
        "user_id", "ts", "ts", maxDelay = "1 hour",
        watermark = "0 seconds", joinType = "full_outer")
      val out = joined.select(
        coalesce(col("user_id"), col("r_user_id")).as("user_id"),
        col("event_id").as("click_id"),
        expr("unix_micros(ts) div 1000").as("click_ms"),
        col("r_event_id").as("purchase_id"),
        expr("unix_micros(r_ts) div 1000").as("purchase_ms"))
      () => StreamOps.startParquetSink(out, memFOJoin.out(base),
        memFOJoin.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memFOJoin.out(base)))

  private val memDedup: Member = Member("stream_dedup_keys", Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val deduped = StreamOps.dedupedStream(
        evs.select(col("ts"), col("user_id"), col("event_type")),
        "ts", idCol = "user_id", watermark = "1 day")
      () => StreamOps.startParquetSink(deduped.select(col("user_id")),
        memDedup.out(base), memDedup.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memDedup.out(base)))

  private val memQuality: Member = Member("stream_quality_filter",
    Set("documents"),
    launch = (spark, dir, base) => {
      val docs = docStream(spark, dir, base)
      val scored = TextQueries.qualityVerdict(docs)
      () => StreamOps.startParquetSink(scored, memQuality.out(base),
        memQuality.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memQuality.out(base)))

  private val memBloom: Member = Member("stream_bloom_probe",
    Set("documents"),
    launch = (spark, dir, base) => {
      val ss = streamSession(spark)
      // bounded collect: a build() result is ≤ m = 4096 position ints
      val bits = graft.operators.Bloom.build(
          ss.read.parquet(s"$dir/documents.parquet")
            .filter(col("doc_id") % 19 === 0), col("text"), k = 4, m = 4096)
        .collect().map(_.getInt(0)).toSeq
      val docs = docStream(spark, dir, base)
      val out = docs.select(col("doc_id"),
        graft.operators.Bloom.memberExpr(col("text"), bits, k = 4, m = 4096)
          .cast("int").as("maybe_member"))
      () => StreamOps.startParquetSink(out, memBloom.out(base), memBloom.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memBloom.out(base)))

  private val memGSample: Member = Member("stream_group_sample",
    Set("documents"),
    launch = (spark, dir, base) => {
      val ss = streamSession(spark)
      val docs = docStream(spark, dir, base)
      val agg = StreamOps.boundedGroupSample(ss, docs, "source", "doc_id",
        k = 20)
      () => StreamOps.startParquetSinkUpdates(agg, memGSample.out(base),
        memGSample.ckpt(base))
    },
    read = (spark, base) =>
      spark.read.parquet(memGSample.out(base))
        .groupBy("source")
        .agg(max_by(col("ids"), col("n_seen")).as("ids"))
        .select(col("source"),
          posexplode(col("ids")).as(Seq("pos", "doc_id")))
        .select(col("doc_id"), col("source"),
          (col("pos") + 1).cast("int").as("sample_rank")))

  private val memCorpusDedup: Member = Member("stream_corpus_dedup",
    Set("documents"),
    launch = (spark, dir, base) => {
      val ss = streamSession(spark)
      val docs = docStream(spark, dir, base)
      val hist = ss.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 7 === 0)
      val fresh = StreamOps.dedupAgainstCorpus(docs, hist)
        .select("doc_id", "source")
      () => StreamOps.startParquetSink(fresh, memCorpusDedup.out(base),
        memCorpusDedup.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memCorpusDedup.out(base)))

  private val memManifest: Member = Member("stream_shard_manifest",
    Set("documents"),
    launch = (spark, dir, base) => {
      val docs = docStream(spark, dir, base)
      val agg = docs.filter(col("doc_id").isNotNull)
        .select(
          graft.operators.Shard.shardOf(col("doc_id"), 8).as("shard"),
          size(split(trim(lower(col("text"))), "[ \\t\\n\\r]+")).cast("long")
            .as("n_tok"),
          col("n_chars"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          sum("n_chars").as("n_chars"))
      () => StreamOps.startParquetSinkUpdates(agg, memManifest.out(base),
        memManifest.ckpt(base))
    },
    read = (spark, base) =>
      spark.read.parquet(memManifest.out(base))
        .groupBy("shard")
        .agg(max(struct(col("n_docs"), col("n_tokens"), col("n_chars")))
          .as("m"))
        .select(col("shard"), col("m.n_docs").as("n_docs"),
          col("m.n_tokens").as("n_tokens"), col("m.n_chars").as("n_chars")))

  private val memIvf: Member = Member("stream_ivf_ingest",
    Set("embeddings"),
    launch = (spark, dir, base) => {
      val ss = streamSession(spark)
      val hist = ss.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id"),
          graft.operators.Similarity.asDouble(col("embedding")).as("vec"))
      val cents = graft.operators.Ivf.train(hist, k = 8, iters = 1)
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      val schema = Tables.load(spark, dir, "embeddings").schema
      val vecs = StreamOps.fileStream(ss,
          base.resolve("in_embeddings").toString, schema)
        .select(col("vec_id").as("id"),
          graft.operators.Similarity.asDouble(col("embedding")).as("vec"))
      val assigned = StreamOps.ivfIngest(vecs, cents)
      () => StreamOps.startParquetSink(assigned, memIvf.out(base),
        memIvf.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memIvf.out(base)))

  private val memEnrich: Member = Member("stream_enrich_join", Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val ss = evs.sparkSession
      val dim = ss.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val enriched = evs
        .join(dim, evs("user_id") === dim("c_custkey"))
        .select(col("event_id"), col("user_id"), col("c_name"),
          col("c_mktsegment"),
          // the event stream pre-casts value to the exact-sum decimal;
          // this join aggregates nothing, so hand back the source double
          col("value").cast("double").as("value"))
      () => StreamOps.startParquetSink(enriched, memEnrich.out(base),
        memEnrich.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memEnrich.out(base)))

  private val memTotals: Member = Member("stream_running_totals",
    Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val totals = StreamOps.runningTotals(evs.sparkSession, evs,
        "user_id", "value")
      () => StreamOps.startParquetSinkUpdates(totals, memTotals.out(base),
        memTotals.ckpt(base))
    },
    read = (spark, base) =>
      spark.read.parquet(memTotals.out(base))
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_value"))).as("m"))
        .select(col("user_id"), col("m.n_events").as("n_events"),
          col("m.total_value").cast("double").as("total_value")))

  private val memAlerts: Member = Member("stream_threshold_alerts",
    Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
        .filter(col("value") >= 0)
      val alerts = StreamOps.thresholdAlerts(evs.sparkSession, evs,
        "user_id", "value", threshold = 500.0)
      () => StreamOps.startParquetSink(alerts, memAlerts.out(base),
        memAlerts.ckpt(base))
    },
    read = (spark, base) => spark.read.parquet(memAlerts.out(base)))

  private val memCdc: Member = Member("stream_cdc_merge", Set.empty,
    launch = (spark, dir, base) => {
      val root = base.resolve("stream_cdc_merge")
      val orders = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val target = root.resolve("target").toString
      orders.filter(col("o_orderkey") % 2 === 0).write.parquet(target)
      val stage = root.resolve("in").toString
      orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .write.parquet(stage)
      val ss = streamSession(spark)
      val changelog = StreamOps.fileStream(ss, stage, orders.schema)
      () => StreamOps.startForeachBatchMerge(changelog, target, memCdc.ckpt(base),
        keys = Seq("o_orderkey"))
    },
    read = (spark, base) => spark.read.parquet(
      base.resolve("stream_cdc_merge").resolve("target").toString))

  private val memScd2: Member = Member("stream_scd2", Set("events"),
    launch = (spark, dir, base) => {
      val evs = eventStream(spark, dir, base)
      val prepared = evs.select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      val changes = StreamOps.scd2Changes(evs.sparkSession, prepared,
        "user_id", "event_type", "us", "event_id")
      () => StreamOps.startParquetSink(changes, memScd2.out(base),
        memScd2.ckpt(base))
    },
    read = (spark, base) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      spark.read.parquet(memScd2.out(base))
        .withColumn("__next", lead(col("us"), 1).over(w))
        .select(col("user_id"), col("event_type").as("attr"),
          expr("us div 1000").as("eff_from_ms"),
          coalesce(expr("__next div 1000"), lit(-1L)).as("eff_to_ms"),
          when(col("__next").isNull, 1).otherwise(0).cast("int")
            .as("is_current"))
    })

  private val members: Seq[Member] = Seq(memDaily, memSliding, memSession,
    memIJoin, memOJoin, memFOJoin, memDedup, memQuality, memBloom,
    memGSample, memCorpusDedup, memManifest, memIvf, memEnrich, memTotals,
    memAlerts, memCdc, memScd2)
  private val byName: Map[String, Member] =
    members.map(m => m.name -> m).toMap

  /** The generation registry. All group state is guarded by one lock:
    * drains are serialized anyway (a drain IS the expensive section),
    * and concurrent first-callers of one generation simply block until
    * the drain commits, then read back. */
  private object DrainGroup {
    private final class St(val gen: Long, val base: java.nio.file.Path,
                           val prevBase: Option[java.nio.file.Path]) {
      val consumed = scala.collection.mutable.Set[String]()
    }
    private val lock = new Object
    private val states =
      scala.collection.mutable.Map[(SparkSession, String), St]()
    // observability for the spec: total group drains this JVM
    private[queries] val drains = new java.util.concurrent.atomic.AtomicLong
    // cumulative wall nanos spent INSIDE generation drains this JVM:
    // Bench samples this around each measured query to attribute the
    // group-drain cost to its own artifact field (stream_generation_sec)
    // instead of leaving it on whichever member a pass hits first
    private[queries] val drainNanos =
      new java.util.concurrent.atomic.AtomicLong

    /** The member subset this JVM's battery runs: a filtered battery
      * (SPARK_GRAFT_ONLY — Bench/Verify iteration aid, ScaleBench
      * per-family children) must not drain 17 siblings nobody will
      * read. The requested member is always included. */
    private def scoped(requested: Option[String]): Seq[Member] = {
      val only = sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      only match {
        case None => members
        case Some(names) =>
          members.filter(m => names.contains(m.name) ||
            requested.contains(m.name))
      }
    }

    /** CALLER CONTRACT (generation retention): the returned DataFrame
      * is LAZY and reads this generation's committed sink files. Those
      * files survive exactly ONE subsequent generation (newGeneration
      * keeps the previous base for in-flight readers and wipes the one
      * before that), so a caller must materialize a result before
      * re-invoking consumed members twice — every in-repo caller
      * (Verify's parquet write, Bench's noop sink, the specs' collects)
      * materializes immediately. Holding a lazy result across two
      * fresh generations reads deleted paths. */
    def resultFor(name: String, spark: SparkSession,
                  dir: String): DataFrame = {
      val m = byName(name)
      val base = lock.synchronized {
        val key = (spark, dir)
        val st = states.get(key) match {
          case Some(s) if !s.consumed(name) &&
              java.nio.file.Files.exists(s.base.resolve(name)) => s
          case prev => newGeneration(spark, dir, prev, Some(name))
        }
        st.consumed += name
        st.base
      }
      m.read(spark, base)
    }

    /** Drain a full generation and mark EVERY member consumed: the
      * warmup shape. The next battery pass then pays for its own
      * fresh-generation drain inside its own timer — the warmup only
      * absorbs the per-process constants (StreamExecution machinery,
      * state-store providers, file-sink metadata log, codegen). */
    def warmupAll(spark: SparkSession, dir: String): Unit =
      lock.synchronized {
        val key = (spark, dir)
        val st = newGeneration(spark, dir, states.get(key), None)
        st.consumed ++= scoped(None).map(_.name)
      }

    /** Stage shared sources once, start every scoped member's drain,
      * await them all. Keeps the PREVIOUS generation's files on disk
      * (a caller may still be materializing a DataFrame read from
      * them) and wipes the one before that. */
    private def newGeneration(spark: SparkSession, dir: String,
                              prev: Option[St],
                              requested: Option[String]): St = {
      val gen0 = System.nanoTime()
      val gen = prev.map(_.gen + 1).getOrElse(1L)
      prev.flatMap(_.prevBase).foreach(p => rmTree(p.toFile))
      val safe = spark.sparkContext.applicationId + "_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft_streams_g${gen}_$safe")
      rmTree(base.toFile)
      java.nio.file.Files.createDirectories(base)
      val ms = scoped(requested)
      // resolve batch schemas BEFORE the parallel launches: Tables.load
      // caches per (session, path) — dir-correct by construction — and
      // warming it here keeps 18 launch threads off its cache lock
      Seq("events", "documents").foreach(t => Tables.load(spark, dir, t))
      ms.flatMap(_.tables).distinct.foreach {
        case "events" => stageTable(dir, "events", base.resolve("in_events"))
        case "documents" =>
          stageTable(dir, "documents", base.resolve("in_documents"))
        case "embeddings" =>
          stageTable(dir, "embeddings", base.resolve("in_embeddings"))
      }
      ms.foreach(m =>
        java.nio.file.Files.createDirectories(base.resolve(m.name)))
      // launch in parallel: a launch does its member's static prep
      // (bloom build, IVF train, CDC seed) and .start()s the drain
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(ms.size, 8))
      val started =
        java.util.concurrent.ConcurrentHashMap.newKeySet[StreamingQuery]()
      try {
        import scala.jdk.CollectionConverters._
        val dbg = sys.env.contains("SPARK_GRAFT_STREAM_DEBUG")
        val t0 = System.nanoTime()
        def el = f"${(System.nanoTime() - t0) / 1e9}%.2f"
        // phase 1: every member's prep (static batch work + plan
        // building), with the box to itself
        val prepFuts = pool.invokeAll(ms.map(m =>
          new java.util.concurrent.Callable[(String, () => StreamingQuery)] {
            def call(): (String, () => StreamingQuery) = {
              val l0 = System.nanoTime()
              val th = m.launch(spark, dir, base)
              if (dbg) System.err.println(f"[drain] ${m.name} prepped " +
                f"in ${(System.nanoTime() - l0) / 1e9}%.2f s (t=$el)")
              (m.name, th)
            }
          }).asJava)
        // surface the FIRST prep failure (get() rethrows)
        val thunks = prepFuts.asScala.map(_.get()).toSeq
        // phase 2: start all drains together, then await them all
        val startFuts = pool.invokeAll(thunks.map { case (n, th) =>
          new java.util.concurrent.Callable[(String, StreamingQuery)] {
            def call(): (String, StreamingQuery) = {
              val q = th()
              started.add(q)
              if (dbg) System.err.println(s"[drain] $n started (t=$el)")
              (n, q)
            }
          }
        }.asJava)
        val queries = startFuts.asScala.map(_.get()).toSeq
        queries.foreach { case (n, q) =>
          q.awaitTermination()
          if (dbg) System.err.println(s"[drain] $n terminated (t=$el)")
        }
      } catch {
        case e: Throwable =>
          started.forEach(q => try q.stop() catch { case _: Exception => () })
          throw e
      } finally pool.shutdown()
      drains.incrementAndGet()
      drainNanos.addAndGet(System.nanoTime() - gen0)
      val st = new St(gen, base, prev.map(_.base))
      states((spark, dir)) = st
      st
    }
  }

  /** Pre-drain one full generation and mark it consumed — the Bench
    * warmup hook (see [[DrainGroup.warmupAll]]). */
  def warmupDrains(spark: SparkSession, dir: String): Unit =
    DrainGroup.warmupAll(spark, dir)

  private[queries] def drainCount: Long = DrainGroup.drains.get()

  /** Cumulative seconds this JVM has spent inside generation drains —
    * the attribution hook for Bench's `stream_generation_sec` field. */
  def drainSecondsTotal: Double = DrainGroup.drainNanos.get() / 1e9

  /** Tumbling per-day aggregate per event_type, streamed: readStream →
    * [[StreamOps.tumblingDailyAgg]] → checkpointed parquet sink
    * (AvailableNow) → read back. Mean is derived from the exact sum at
    * read-back with one double division, matching the oracle's davg
    * form. */
  def streamDailyAgg(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_daily_agg", spark, dir)

  /** Sliding 7-day/1-day window sums, streamed — the streaming form of
    * W1's trailing rolling sums, under the same AvailableNow drain
    * harness. Append emission holds back every window whose end lies
    * beyond the final watermark; the oracle regenerates the slide grid
    * (epoch-aligned daily starts, 7 per event) and applies the same
    * end-≤-max-day cutoff. */
  def streamSlidingSum(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_sliding_sum", spark, dir)

  /** Session windows, streamed — the third windowed form under the
    * drain harness. Spark merges two events into one session iff their
    * gap is STRICTLY less than the gap duration (windows are
    * half-open), and a session's end is last-event + gap; the oracle's
    * gaps-and-islands uses the same strict rule and the same
    * end-≤-max-event cutoff for append emission. Timestamps emitted as
    * epoch ms (never raw ts — ns/µs mismatch across engines). */
  def streamSessionAgg(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_session_agg", spark, dir)

  /** Watermarked stream-stream interval join (the attribution shape:
    * purchase ≤ 1 h after a same-user click), drained. A streaming
    * INNER join emits each pair the moment both rows are present —
    * watermarks only bound retained state, never hold back matches —
    * so a full AvailableNow drain equals the batch join exactly and
    * the oracle is the plain interval-join SQL, no cutoff needed. */
  def streamIntervalJoin(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_interval_join", spark, dir)

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
  def streamOuterJoin(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_outer_join", spark, dir)

  /** FULL OUTER stream-stream interval join, drained: both unmatched
    * sides surface — clicks that never converted AND purchases with no
    * qualifying prior click. Each side's null-augmented rows are gated
    * by ITS OWN state eviction: unmatched clicks need the watermark
    * past click + maxDelay (as in [[streamOuterJoin]]); unmatched
    * purchases need it past the purchase time itself (a purchase can
    * only match clicks in [p − 1 h, p], so its state expires once the
    * watermark passes p). Same millisecond-floored min-of-sides final
    * watermark; both gates reproduced in the oracle. */
  def streamFullOuterJoin(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_full_outer_join", spark, dir)

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
  def streamDedupKeys(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_dedup_keys", spark, dir)

  /** The corpus-cleaning battery run INCREMENTALLY: documents arrive as
    * a file stream (the staged-download shape a crawling pipeline
    * produces) and the full quality battery — tokenization, stopword
    * ratio, language ID, verdict — evaluates per micro-batch as pure
    * stateless projections (all codegen, no state store), drained
    * through the checkpointed sink. Stateless append emits every row
    * immediately, so the drain equals the batch query exactly and the
    * oracle is quality_filter's own SQL. This is the shape a 100 TB/day
    * ingest actually runs: clean-on-arrival, not clean-after-landing. */
  def streamQualityFilter(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_quality_filter", spark, dir)

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
  def streamBloomProbe(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_bloom_probe", spark, dir)

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
  def streamGroupSample(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_group_sample", spark, dir)

  /** Continuous-ingest dedup against a historical corpus
    * ([[StreamOps.dedupAgainstCorpus]]): documents arrive as a file
    * stream and pass only if their exact-text md5 is absent from the
    * static fingerprint index (docs with doc_id % 7 = 0 play the
    * already-ingested corpus). Stateless LEFT ANTI stream-static join —
    * append mode, no state store — so the drained sink equals the batch
    * anti-join verbatim; the corpus's real exact-dup texts make the
    * filter bite beyond the carved slice itself. */
  def streamCorpusDedup(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_corpus_dedup", spark, dir)

  /** Incremental shard manifest ([[graft.operators.Shard]] columns
    * under a streaming aggregate): as documents arrive, the per-shard
    * doc/token/char totals stay current in numShards rows of state —
    * the trainer sidecar maintained DURING ingest instead of recomputed
    * after. Sums/counts are order-insensitive and the shard key is
    * stateless, so the drained final state equals the batch
    * [[CorpusQueries.shardManifest]] bit-for-bit (same oracle verbatim);
    * Update-mode drain recovered via the monotone-n_docs struct max. */
  def streamShardManifest(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_shard_manifest", spark, dir)

  /** Stateless streaming IVF-index ingest
    * ([[StreamOps.ivfIngest]]): embeddings arrive as a file stream and
    * each is assigned to its nearest centroid of an index TRAINED ON
    * THE HISTORICAL SLICE (even vec_ids) — the centroid set rides the
    * plan as literals, so the query is a pure projection (no state, no
    * stream-side shuffle). Assignment is a pure function of the
    * vector, so the drain equals the batch assignment however the
    * input was micro-batched; the oracle re-derives the train-slice
    * k-means in SQL and assigns every vector against it. */
  def streamIvfIngest(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_ivf_ingest", spark, dir)

  /** Stream-STATIC enrichment join — the remaining join mode of the
    * streaming surface (stream-stream is `stream_interval_join`): each
    * arriving event joins the static customer dimension statelessly (no
    * state store, no watermark — the static side is simply read per
    * micro-batch, broadcast by AQE when small). Append emits every
    * match immediately, so the drain equals the batch join and the
    * oracle is plain SQL. This is the canonical 100 TB ingest-enrich
    * shape: facts stream in, dimensions sit still. */
  def streamEnrichJoin(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_enrich_join", spark, dir)

  /** Keyed running totals (mapGroupsWithState), drained: the custom-
    * state surface under the oracle. The state sums are exact decimal
    * ([[StreamOps.runningTotals]]), so the FINAL state per key equals a
    * batch GROUP BY bit-for-bit; Update-mode drains append one row per
    * (key, batch), and the monotone event count picks the final one via
    * max(struct(n, total)) — replay/duplicate-safe. */
  def streamRunningTotals(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_running_totals", spark, dir)

  /** Threshold-crossing alerts (flatMapGroupsWithState), drained: the
    * 0..n-output custom-state surface under the oracle. With the
    * non-negative `value` filter the running total is monotone, so the
    * union of every batch's emitted levels is exactly
    * `1..floor(total/500)` per user — batch-count-independent, which is
    * what makes the alert SET a cross-engine contract
    * ([[StreamOps.thresholdAlerts]] computes floor on the double cast of
    * the exact decimal total, the same IEEE ops the oracle runs). */
  def streamThresholdAlerts(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_threshold_alerts", spark, dir)

  /** CDC changelog → keyed-dataset merge (foreachBatch), driver-
    * verified: seed a keyed parquet snapshot (even order keys at their
    * current price), stream a changelog (every third key re-priced
    * +1000) through [[StreamOps.foreachBatchMerge]], read the merged
    * dataset back. Last-write-wins per key: updated keys carry the
    * changelog row, untouched seed keys survive, new keys append —
    * the streaming form of the O8 catalog upsert
    * (/root/reference/pipelines/tiger/county.yml:65-72). */
  def streamCdcMerge(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_cdc_merge", spark, dir)

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
  def streamScd2(spark: SparkSession, dir: String): DataFrame =
    DrainGroup.resultFor("stream_scd2", spark, dir)

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
