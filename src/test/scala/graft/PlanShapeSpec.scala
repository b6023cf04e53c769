package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sink

/** Physical-plan shape assertions — the 100 TB design contract.
  * Correctness tests prove the small-scale answer; these prove the PLAN
  * is the one that survives a 1000-executor scale-up: broadcasts where a
  * side is small, partition pruning on day-partitioned data, parquet
  * filter/column pushdown, native expressions inside codegen.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("topic_cooccurrence: basket joins are equi; the only cross join " +
    "is the broadcast 1-row corpus count") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = queries.CorpusQueries.topicCooccurrence(spark, sf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    val crosses = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    // every condition-free join must have a grand-aggregate side (the
    // 1-row N) — never basket × basket
    crosses.foreach { j =>
      val bounded = Seq(j.left, j.right).exists(side =>
        side.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }.isDefined)
      assert(bounded, s"unbounded cross join in plan:\n$j")
    }
  }

  test("rollup_agg / cube_agg: Expand runs over the LEAF AGGREGATE, " +
    "never over the scan (no input row crosses Expand)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Generate}
    Seq(queries.AdvancedQueries.rollupAgg(spark, sf),
      queries.AdvancedQueries.cubeAgg(spark, sf)).foreach { df =>
      // the grouping-set fanout is a Generate (explode over the level
      // array) in the leaf-reagg form; the builtin would be an Expand
      val fanouts = df.queryExecution.optimizedPlan.collect {
        case e: Expand => e.asInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.UnaryNode]
        case g: Generate => g
      }
      assert(fanouts.nonEmpty, "no grouping-set fanout node found — " +
        "plan changed shape entirely?")
      // every fanout's subtree must contain the leaf Aggregate: the
      // level multiplication touches dozens of leaf rows, not the
      // full input (the builtin rollup/cube plan Expands the scan)
      fanouts.foreach { e =>
        assert(e.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"grouping-set fanout directly over input:\n$e")
      }
    }
  }

  test("weighted_sample: the byWeight thinning adds NO exchange on top " +
    "of the weights plan (stateless projection + filter)") {
    val weights = queries.TextQueries.clusterSizeWeights(spark, sf)
    val sampled = queries.TextQueries.weightedSample(spark, sf)
    def nExchanges(df: org.apache.spark.sql.DataFrame) =
      "Exchange".r.findAllIn(plan(df)).size
    assert(nExchanges(sampled) == nExchanges(weights),
      "byWeight must not introduce a shuffle")
  }

  test("mixture_resample broadcasts the per-stratum factors (no fact shuffle)") {
    val p = plan(queries.CorpusQueries.mixtureResample(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("pii_scrub is a stateless projection (only the Spread.up " +
    "scan-parallelism repartition)") {
    val p = plan(queries.CorpusQueries.piiScrub(spark, sf))
    // r15: one REPARTITION exchange from Spread.up (guide §2.5); the
    // scrub battery itself must stay exchange-free
    assert(p.split("Exchange").length - 1 <= 1, p.take(2000))
    assert(!p.contains("ENSURE_REQUIREMENTS"), p.take(2000))
  }

  test("gopher_rules is a stateless projection (only the Spread.up " +
    "scan-parallelism repartition, whole battery inside codegen)") {
    val p = plan(queries.TextQueries.gopherRules(spark, sf))
    // r15: Spread.up floors the kernel-stage parallelism with ONE
    // round-robin/hash REPARTITION exchange when the scan has fewer
    // splits than cores (guide §2.5); the rule battery itself must
    // still be exchange-free — no aggregate/join exchange beyond it.
    assert(p.split("Exchange").length - 1 <= 1, p.take(2000))
    assert(!p.contains("ENSURE_REQUIREMENTS"), p.take(2000))
    // no interpreted higher-order function or UDF snuck into the rules
    assert(!p.contains("ArrayFilter") && !p.contains("ArrayTransform") &&
      !p.toLowerCase.contains("batchevalpython"), p.take(2000))
  }

  test("j1_multiply broadcasts the part dimension (no shuffle of facts)") {
    val p = plan(queries.RelationalQueries.j1Multiply(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("p1_clip is a broadcast LEFT SEMI join") {
    val p = plan(queries.RelationalQueries.p1Clip(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(2000))
  }

  test("q1_agg scan prunes columns and pushes the date filter") {
    val p = plan(queries.CoreQueries.q1Agg(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(3000))
    // projection pruning: partkey/suppkey/extended columns not in scan
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"), p.take(3000))
  }

  test("near_dup_cosine ships the blocked plan: no unbounded cross join") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, LocalRelation}
    val df = queries.VectorQueries.nearDupCosine(spark, sf)
    val p = plan(df)
    assert(p.contains("dot_product"), p.take(3000))
    // the corpus-pair join must be a shuffle equi-join on the cluster
    // key (partitioned across executors); any cross join in the plan
    // must have a constant-bounded side (the limit-k centroid set) —
    // an unbounded corpus × corpus nested loop is the O(n²) shape the
    // brute-force _exact cross-check alone is allowed to carry
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      p.take(4000))
    val crosses = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    crosses.foreach { j =>
      // a limit-k plan or a materialized k-row LocalRelation both bound
      // the side by the (constant) centroid count
      val bounded = Seq(j.left, j.right).exists(side =>
        side.collectFirst { case g: GlobalLimit => g }.isDefined ||
          side.collectFirst { case l: LocalRelation => l }.isDefined)
      assert(bounded, s"unbounded cross join in plan:\n$j")
    }
  }

  test("near_dup_cosine_exact keeps the brute-force shape (cross-check)") {
    val p = plan(queries.VectorQueries.nearDupCosineExact(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains(">= 0.3"), p.take(3000))
  }

  test("LSH candidate join carries no broadcast of the banded side") {
    val df = queries.VectorQueries.lshCandidates(spark, sf)
    // the banded table is O(docs × bands): it grows with the corpus, so
    // the plan must never pin it to the driver via a broadcast HINT.
    // (An AQE runtime conversion based on measured size would be fine —
    // the static plan is what ships to 100 TB.)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.toLowerCase.contains("broadcast"), logical.take(3000))
    val p = plan(df)
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      p.take(4000))
  }

  test("dedup_jaccard posting self-join is shuffle-based, not broadcast") {
    val df = queries.TextQueries.dedupJaccard(spark, sf)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.toLowerCase.contains("broadcast"), logical.take(3000))
  }

  test("range_join executes as a hash equi-join on the bin, never a theta plan") {
    val df = queries.RelationalQueries.rangeJoin(spark, sf)
    val p = plan(df)
    // a naive interval theta join can only run as BNLJ/cartesian —
    // the bin rewrite must produce a HASH join keyed on the bin
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"), p.take(3000))
  }

  test("IVF index layout: probes prune to their cluster partitions") {
    import graft.operators.{Ivf, Similarity}
    val dir = Files.createTempDirectory("graft_ivf").toString + "/index"
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("vec"))
    val centroids = Ivf.train(corpus, k = 4, iters = 0)
    Ivf.writeIndex(Ivf.assign(corpus, centroids), dir)
    // a probe of clusters {1,2} must scan ONLY those two directories
    val probe = spark.read.parquet(dir)
      .filter(col("cluster_id").isin(1, 2))
    assert(plan(probe).contains("PartitionFilters"), plan(probe).take(2000))
    val scanned = probe.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(f =>
      f.contains("cluster_id=1") || f.contains("cluster_id=2")),
      scanned.take(5).mkString("\n"))
  }

  test("day-partitioned writes prune partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    Sink.writeDayPartitioned(Tables.events(spark, sf), col("ts"), dir)
    val read = spark.read.parquet(dir)
      .filter(col("day") === "2024-01-05")
    val p = plan(read)
    assert(p.contains("PartitionFilters"), p.take(3000))
    // pruned scan must touch exactly the one matching partition
    val scanned = read.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("day=2024-01-05")))
  }

  test("dynamic partition overwrite touches only the re-run day") {
    val dir = Files.createTempDirectory("graft_dpo").toString + "/events"
    val events = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    events.write.mode("overwrite").partitionBy("day").parquet(dir)
    // partition-column inference reads `day` back as DATE — stringify
    val before = spark.read.parquet(dir)
      .groupBy("day").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val day = before.keys.min
    // "re-run" one day with halved data; other partitions must not change
    val slice = events.filter(col("day") === day)
      .filter(col("event_id") % 2 === 0)
    Sink.overwritePartitions(slice, Seq("day"), dir)
    val after = spark.read.parquet(dir)
      .groupBy("day").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(after(day) < before(day), "re-run day must shrink")
    assert(before.removed(day) == after.removed(day),
      "untouched partitions changed")
  }

  test("compaction collapses a many-file dataset to the target count") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    Tables.orders(spark, sf).repartition(24)
      .write.mode("overwrite").parquet(dir)
    val rowsBefore = spark.read.parquet(dir).count()
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts(dir) == 24)
    Sink.compact(spark, dir, targetMB = 1024) // tiny data -> 1 file
    assert(parts(dir) == 1, "expected a single compacted file")
    assert(spark.read.parquet(dir).count() == rowsBefore)
  }

  test("mergeInto upserts by key: updates replace, new keys append") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/t"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v").write.parquet(dir)
    val updates = Seq((2L, "b2", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "v")
    Sink.mergeInto(spark, dir, updates, Seq("id"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("b2", 99.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("mergeInto: duplicate update keys fail fast; precedence picks winner") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge2").toString + "/t"
    Seq((1L, "a", 1)).toDF("id", "name", "seq").write.parquet(dir)
    val dups = Seq((1L, "x", 2), (1L, "y", 3)).toDF("id", "name", "seq")
    // the guard is IN the rewrite plan (no pre-pass job): it surfaces
    // as a runtime error from the write, before any rename happens
    val e = intercept[Exception] {
      Sink.mergeInto(spark, dir, dups, Seq("id"))
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(e).contains("duplicate keys"), messages(e))
    // the failed merge must not have touched the dataset
    assert(spark.read.parquet(dir).collect().map(_.getString(1)).toSeq
      == Seq("a"))
    Sink.mergeInto(spark, dir, dups, Seq("id"), precedence = Seq(col("seq")))
    val r = spark.read.parquet(dir).collect()
    assert(r.length == 1 && r.head.getString(1) == "y") // highest seq wins
  }

  test("mergeInto: a key moved across partitions loses its old row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge4").toString + "/t"
    Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
      .toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    // id=3 moves p2 → p1: its old p2 row must disappear, and since p2
    // is thereby emptied the whole p2 directory must go too (dynamic
    // overwrite alone cannot drop a partition with no output rows)
    Sink.mergeInto(spark, dir, Seq((3L, "p1", 99.0)).toDF("id", "part", "v"),
      Seq("id"), partitionCols = Seq("part"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out == Map(1L -> (10.0, "p1"), 2L -> (20.0, "p1"),
      3L -> (99.0, "p1")))
    assert(!new java.io.File(s"$dir/part=p2").exists(),
      "emptied partition directory must be deleted")
    // stablePartitions opt-out: updates stay in their own partition,
    // untouched partitions' files byte-identical
    def filesIn(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
    val p1Before = filesIn(s"$dir/part=p1")
    Sink.mergeInto(spark, dir, Seq((4L, "pX", 1.0)).toDF("id", "part", "v"),
      Seq("id"), partitionCols = Seq("part"), stablePartitions = true)
    assert(filesIn(s"$dir/part=p1") == p1Before)
    assert(spark.read.parquet(dir).count() == 4)
  }

  test("mergeInto with partitionCols rewrites only touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge3").toString + "/t"
    Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
      .toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    def filesIn(p: String) = {
      val d = new java.io.File(p)
      if (d.exists) d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> f.lastModified).toMap
      else Map.empty[String, Long]
    }
    val p2Before = filesIn(s"$dir/part=p2")
    Sink.mergeInto(spark, dir,
      Seq((2L, "p1", 99.0), (4L, "p1", 40.0)).toDF("id", "part", "v"),
      Seq("id"), partitionCols = Seq("part"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0, 4L -> 40.0))
    // the untouched partition's FILES are byte-identical (not rewritten)
    assert(filesIn(s"$dir/part=p2") == p2Before)
  }

  test("deleteKeys rewrites only partitions holding doomed rows; " +
    "emptied partitions vanish") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_del").toString + "/t"
    Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0),
      (4L, "p3", 40.0))
      .toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    def filesIn(p: String) = {
      val d = new java.io.File(p)
      if (d.exists) d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> f.lastModified).toMap
      else Map.empty[String, Long]
    }
    val p2Before = filesIn(s"$dir/part=p2")
    // id 1 lives in p1 (rewritten, id 2 survives); id 4 empties p3
    Sink.deleteKeys(spark, dir, Seq(1L, 4L).toDF("id"), Seq("id"),
      partitionCols = Seq("part"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(2L -> 20.0, 3L -> 30.0))
    // the untouched partition's FILES are byte-identical (not rewritten)
    assert(filesIn(s"$dir/part=p2") == p2Before)
    // the fully-deleted partition's directory is gone, not empty
    assert(!new java.io.File(s"$dir/part=p3").exists)
    // no-match deletions touch nothing at all
    val all = Files.walk(java.nio.file.Paths.get(dir)).toArray.length
    Sink.deleteKeys(spark, dir, Seq(99L).toDF("id"), Seq("id"),
      partitionCols = Seq("part"))
    assert(Files.walk(java.nio.file.Paths.get(dir)).toArray.length == all)
  }

  test("mergeInto: null partition values match null-safely (default " +
    "partition never wrongly emptied)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge5").toString + "/t"
    // keys 2 and 3 live in the NULL (Hive default) partition
    Seq((1L, Some("p1"), 10.0), (2L, None, 20.0), (3L, None, 30.0))
      .toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    // key 3 moves null → p1: kept must retain key 2's null-partition
    // row (null-safe semi join), and the null partition must NOT be
    // deleted as "emptied"
    Sink.mergeInto(spark, dir,
      Seq((3L, Some("p1"), 99.0)).toDF("id", "part", "v"),
      Seq("id"), partitionCols = Seq("part"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), Option(r.getString(2)))).toMap
    assert(out == Map(1L -> (10.0, Some("p1")), 2L -> (20.0, None),
      3L -> (99.0, Some("p1"))))
    // and when the null partition IS fully emptied, it goes away
    Sink.mergeInto(spark, dir,
      Seq((2L, Some("p1"), 21.0)).toDF("id", "part", "v"),
      Seq("id"), partitionCols = Seq("part"))
    assert(!new java.io.File(s"$dir/part=__HIVE_DEFAULT_PARTITION__")
      .exists(), "fully-emptied default partition must be deleted")
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("swap recovery: a crash between renames self-heals on the next call") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_swap").toString
    val dir = s"$root/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir)
    // simulate a crash mid-swap: dataset moved aside, replacement never
    // landed — exactly the state after rename #1
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$root/t__merge_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    // the next merge must first restore the dataset, then apply updates
    Sink.mergeInto(spark, dir, Seq((1L, "a2")).toDF("id", "name"), Seq("id"))
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/t__merge_old")))
  }

  test("Expect rules count violations in one scan; unique finds dups") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "click"), (2L, None, "view"),
      (2L, Some(2e7), "bogus")).toDF("id", "v", "t")
    val out = graft.operators.Expect.check(df, Seq(
      graft.operators.Expect.notNull("v"),
      graft.operators.Expect.inRange("v", 0, 100),
      graft.operators.Expect.inSet("t", Seq("click", "view"))))
      .unionByName(graft.operators.Expect.unique(df, Seq("id")))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("not_null_v" -> 1L, "range_v" -> 1L,
      "in_set_t" -> 1L, "unique_id" -> 1L))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    Sink.writeBucketed(Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", Seq("o_orderkey"), 4)
    Sink.writeBucketed(Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "lineitem_b", Seq("o_orderkey"), 4)
    // at test scale Catalyst would broadcast (hiding the bucket path);
    // disable auto-broadcast to observe the bucketed join itself
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), "o_orderkey")
      joined.write.format("noop").mode("overwrite").save()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p.take(2000))
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${p.take(3000)}")
      assert(p.contains("Bucketed: true"), p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("winnowing runs on a single exchange (shingle window + winnow " +
    "window + distinct all share the doc partitioning)") {
    val p = plan(queries.TextQueries.winnowQ(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one exchange:\n${p.take(3000)}")
  }

  test("repetition_ratio folds on the shingle partitioning: one exchange") {
    // build window (doc_id), per-shingle count (doc_id, sh) and the
    // final per-doc fold all satisfy the same doc_id hash partitioning
    val p = plan(queries.TextQueries.repetitionRatio(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one exchange:\n${p.take(3000)}")
  }

  test("dup_spans + source_overlap: corpus-sized shingle joins are " +
    "shuffle hash, never broadcast or theta") {
    // both queries join two corpus-sized relations on the shingle key;
    // a broadcast there OOMs the moment the corpus outgrows one
    // executor, and any non-equi fallback is O(n²)
    Seq(queries.CorpusQueries.dupSpans(spark, sf),
      queries.CorpusQueries.dupCoverage(spark, sf),
      queries.CorpusQueries.sourceOverlap(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p.take(3000))
      assert(p.contains("ShuffledHashJoin"), p.take(3000))
    }
  }

  test("tfidf_topk: per-term stats join back on the vocabulary key; " +
    "the top-k window partitions by doc (no global sort)") {
    val p = plan(queries.CorpusQueries.tfidfTopK(spark, sf))
    // vocabulary-sized df table may broadcast (it is sublinear in the
    // corpus), but a single-partition window over all docs must never
    // appear: the rank window is keyed by doc_id
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("Exchange SinglePartition"), p.take(4000))
  }

  test("edit_distance reuses the shared candidate-pair cache") {
    // candidatePairs persists the J>=0.5 pair subplan; both of its
    // consumers must plan against the SAME InMemoryRelation — the
    // round-3 critical-path fix, locked as a plan assertion
    queries.TextQueries.candidatePairs(spark, sf)
    val p = plan(queries.TextQueries.editDistance(spark, sf))
    assert(p.contains("InMemoryTableScan"),
      s"pair generation not served from cache:\n${p.take(3000)}")
  }

  test("sequence_pack exchanges hash on (source, bucket) — never on " +
    "source alone, and the offsets join is a broadcast") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = queries.TextQueries.sequencePack(spark, sf)
    // the data-sized shuffles (local window, subtotal agg) key on the
    // composite; a source-only exchange is legal ONLY above the subtotal
    // aggregate (bounded: one row per (source, bucket))
    val bad = df.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e
    }.filter { e =>
      val sourceOnly = e.outputPartitioning match {
        case h: HashPartitioning => h.expressions.size == 1 &&
          h.expressions.head.references.exists(_.name == "source")
        case _ => false
      }
      val bounded = e.child.collectFirst {
        case a: BaseAggregateExec => a
      }.isDefined
      sourceOnly && !bounded
    }
    assert(bad.isEmpty,
      s"data-sized per-source exchange:\n${bad.mkString("\n")}")
    // the bucket-offset join back must not shuffle the corpus
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("text-scoring battery stays in codegen: no CodegenFallback " +
    "expression anywhere in the quality_filter / lang_id plans") {
    // the round-3 weak spot: filter(x -> x IN (...)) lambdas are
    // CodegenFallback (interpreted per row); ArrayCountInSetExpr keeps
    // marker/stopword counting inside whole-stage codegen — locked here
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    Seq("quality_filter" -> queries.TextQueries.qualityFilter(spark, sf),
        "lang_id" -> queries.TextQueries.langId(spark, sf),
        "text_stats" -> queries.TextQueries.textStats(spark, sf))
      .foreach { case (name, df) =>
        val fallbacks = df.queryExecution.executedPlan.flatMap(node =>
          node.expressions.flatMap(_.collect {
            case e: CodegenFallback => e
          })).distinct
        assert(fallbacks.isEmpty,
          s"$name has interpreted expressions: " +
            fallbacks.map(_.getClass.getSimpleName).mkString(", "))
      }
  }

  test("hll approx distinct within 5% of exact") {
    val rows = queries.AdvancedQueries.hllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: sketch outside 5% of exact ${r.getLong(1)}")
    }
  }

  test("w1 rolling window: one shuffle, window sums share the sort") {
    val df = queries.AggregateQueries.w1Rollsum(spark, sf)
    val p = plan(df)
    // all four windows must evaluate in ONE Window node after one sort
    val windowNodes = "(?m)^\\s*\\*?\\(?\\d*\\)? ?Window ".r
      .findAllIn(p).size
    assert(p.contains("Window"), p.take(2000))
    assert(windowNodes <= 1, s"expected a single Window node, got:\n${p.take(3000)}")
  }

  test("sequence_pack: two-pass prefix sum, no per-source parallelism bound") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // worst case: ONE giant source — the naive `PARTITION BY source`
    // cumsum would run the whole corpus on a single task
    val docs = spark.range(1, 2001).toDF("doc_id")
      .withColumn("source", lit("shard-0"))
      .withColumn("n_tokens", col("doc_id") % 97 + 1)
    val packed = operators.SequencePack.pack(docs, col("doc_id"),
      col("source"), col("n_tokens"), seqLen = 256, buckets = 8)
    val physical = packed.queryExecution.sparkPlan
    // every data-sized window must key on (source, bucket); a window
    // keyed by source alone is only legal above the subtotal aggregate
    // (bounded: one row per (source, bucket))
    val wins = physical.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val boundedInput =
        w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined
      // Catalyst prunes the constant source column from partition specs
      // here (single-source fixture) — the contract is that the bucket
      // key remains, so the corpus never collapses to one window group
      val bucketKeyed = w.partitionSpec.exists(
        _.references.exists(_.name == "__bucket"))
      assert(bucketKeyed || boundedInput,
        s"data-sized window keyed by source alone:\n$w")
    }
    // and no stage funnels the corpus into one partition
    val single = physical.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(single.isEmpty, single.mkString("\n"))
    // regrouped prefix sums must equal the naive per-source cumsum
    val naiveW = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val naive = docs
      .withColumn("__s", coalesce(sum("n_tokens").over(naiveW), lit(0L)))
      .select(col("doc_id"), expr("__s div 256").as("pack_id"),
        pmod(col("__s"), lit(256L)).as("pack_offset"))
    val got = packed.select("doc_id", "pack_id", "pack_offset")
    assert(got.count() == 2000)
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("budget ops: two-pass on a giant source, equal to the naive window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // same worst case as sequence_pack: one giant source would bound
    // the naive `PARTITION BY source` forms to a single task
    val docs = spark.range(1, 2001).toDF("doc_id")
      .withColumn("source", lit("shard-0"))
      .withColumn("n_tokens", col("doc_id") % 97 + 1)
    def pinBucketed(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
        .foreach { w =>
          val boundedInput =
            w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined
          val bucketKeyed = w.partitionSpec.exists(
            _.references.exists(_.name == "__bucket"))
          assert(bucketKeyed || boundedInput,
            s"data-sized window keyed by source alone:\n$w")
        }
    val capped = operators.Budget.capTokens(docs, col("doc_id"),
      col("source"), col("n_tokens"), budget = 40000L, buckets = 8)
    pinBucketed(capped)
    val naiveCumW = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naiveCap = docs
      .withColumn("cum_end", sum("n_tokens").over(naiveCumW))
      .select(col("doc_id"), col("cum_end"),
        (col("cum_end") <= 40000L).as("kept"))
    val gotCap = capped.select("doc_id", "cum_end", "kept")
    assert(gotCap.except(naiveCap).isEmpty &&
      naiveCap.except(gotCap).isEmpty)

    val filtered = operators.Budget.percentileFilter(docs, col("doc_id"),
      col("source"), col("n_tokens"), minPct = 0.25, buckets = 8)
    pinBucketed(filtered)
    val naiveRankW = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("score", "doc_id")
    val naivePct = docs.select(col("doc_id"), col("source"),
        col("n_tokens").cast("long").as("score"))
      .withColumn("pct_rank", percent_rank().over(naiveRankW))
      .select(col("doc_id"), col("pct_rank"),
        (col("pct_rank") >= 0.25).as("kept"))
    val gotPct = filtered.select("doc_id", "pct_rank", "kept")
    assert(gotPct.except(naivePct).isEmpty &&
      naivePct.except(gotPct).isEmpty)
  }

  test("zonal join splits a giant county under AQE skew handling") {
    // giant-county skew (SURVEY §7 item 7): 95% of pixels land in one
    // county. Manual salting is proven by salted_join/salted_sum; this
    // pins the AQE path — a skewed SMJ partition is split at runtime —
    // on an isolated session with thresholds sized to the fixture.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val pixels = ss.range(0, 200000).toDF("pixel_id")
      .withColumn("county",
        when(col("pixel_id") % 20 =!= 0, lit(0L))
          .otherwise(col("pixel_id") % 40))
      .withColumn("value", col("pixel_id") % 1000)
    val counties = ss.range(0, 40).toDF("county")
      .withColumn("county_name", concat(lit("county-"), col("county")))
    val joined = pixels.join(counties, "county")
      .select("pixel_id", "county_name", "value")
    // collect() runs THIS Dataset's own QueryExecution (foreach/rdd spin
    // up a separate one), which is what finalizes the adaptive plan
    assert(joined.collect().length == 200000)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(2000))
    assert(p.contains("skew=true"),
      s"no skew-split join in final plan:\n${p.take(4000)}")
  }

  test("sparse cosine hot-term fanout is capped: above-cap terms never join") {
    // hot-term skew defense. AQE's skew-split cannot help this join:
    // both sides read the PERSISTED postings cache (TableCacheQueryStage,
    // partitioning reused from the build), so there is no shuffle stage
    // to split at runtime. The defense is the df cap, and it is static:
    // (a) a term above maxDf is filtered out BEFORE the join — it
    // contributes zero candidate pairs no matter how hot; (b) a term at
    // the cap fans out to at most maxDf·(maxDf−1)/2 pairs inside one
    // task — bounded by construction, so no partition can exceed
    // (#terms hashed there)·cap²/2 regardless of data skew.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val cap = 500L
    // docs 0..499: the hot term at EXACTLY the cap (worst legal key)
    // plus a unique cold term each (df=1 → no pairs of their own)
    val hotDocs = ss.range(0, cap).toDF("id")
      .select(col("id"), explode(array(lit("hot_term"),
        concat(lit("cold_"), col("id")))).as("term"))
    // docs 10000..14999: ONLY a mega term 10× over the cap; their
    // vectors are identical, so if the term leaked past the cap they
    // would pair at cosine 1.0 and inflate the count below
    val megaDocs = ss.range(10000, 15000).toDF("id")
      .select(col("id"), lit("mega_term").as("term"))
    val pairs = graft.operators.TermIndex.cosinePairs(
      hotDocs.unionByName(megaDocs), minCosine = 0.0, maxDf = cap)
    // exactly the hot term's cap-bounded fanout — nothing from the
    // 5000-doc mega term (its docs carry no surviving postings at all)
    assert(pairs.count() == cap * (cap - 1) / 2)
    val p = pairs.queryExecution.executedPlan.toString
    // and the candidate join stays a shuffled equi-join — no broadcast
    // of a corpus-sized side, no all-pairs fallback
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the AQE runtime-filter path (SURVEY §4 optimizer surface): when a
    // shuffle join's build side carries a selective predicate, Catalyst
    // injects bloom_filter_agg on the dim and might_contain on the fact
    // scan — at 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the ~matching slice. Thresholds
    // sized to the fixture on an isolated session (the application-side
    // scan floor defaults to 10 GB).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    ss.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    val li = Tables.lineitem(ss, sf).select("l_partkey", "l_quantity")
    val dim = Tables.part(ss, sf).filter(col("p_size") === 1)
      .select("p_partkey")
    val joined = li.join(dim, col("l_partkey") === col("p_partkey"))
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain"),
      s"no runtime bloom filter injected:\n${opt.take(4000)}")
    // and the result is unaffected by the filter (no false negatives)
    val expected = Tables.lineitem(ss, sf)
      .join(Tables.part(ss, sf).filter(col("p_size") === 1),
        col("l_partkey") === col("p_partkey")).count()
    assert(joined.count() == expected)
  }

  test("hist_quantile_merge: partials fold to O(bins) before the probe join") {
    val df = queries.AdvancedQueries.histQuantileMerge(spark, sf)
    val p = plan(df)
    // the only non-equi join carries bins × 4 probe rows — it must sit
    // ABOVE the bin-merge aggregate, never against row-level data
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{LocalTableScanExec, RDDScanExec}
    df.queryExecution.sparkPlan.collect {
      case j: BroadcastNestedLoopJoinExec => j
    }.foreach { j =>
      // bounded = an aggregate (bin merge / total) or a literal local
      // relation (the 4 quantile probes) somewhere below each side
      assert(j.children.forall(c => c.collectFirst {
          case a: BaseAggregateExec => a
          case l: LocalTableScanExec => l
          case r: RDDScanExec => r
        }.isDefined),
        s"probe join over unaggregated data:\n$j")
    }
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("sparse_cosine_pairs: postings self-join is shuffle hash, never broadcast") {
    val p = plan(queries.CorpusQueries.sparseCosinePairs(spark, sf))
    // the dot-product join carries two corpus-sized posting relations
    // on the shingle key — same contract as dup_spans/source_overlap
    assert(p.contains("ShuffledHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("triangle census: hash joins throughout, no nested-loop blowup") {
    // localThreshold = 0 forces the DISTRIBUTED census (the query
    // itself takes the driver-local path at spec scale — this test
    // pins the plan the 100 TB path runs)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")),
        "l_orderkey")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    val df = operators.Triangles.perNode(edges, localThreshold = 0)
    val p = plan(df)
    // wedge self-join + closure join must be equi-joins (skew capped by
    // the degree orientation); a BroadcastNestedLoopJoin or cartesian
    // here means the orientation predicate fell out of the join keys
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.take(4000))
  }

  test("ngram_lm_score lookups are size-adaptive: broadcast when the model fits, shuffle-hash past the budget") {
    // r16: the LM lookup strategy follows the measured model size
    // against the session's own broadcast budget. At spec scale the
    // model fits → BOTH lookups broadcast and the scored token stream
    // never shuffles for them...
    val df = queries.CorpusQueries.ngramLmScore(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    // ...and with broadcast disabled (the stand-in for a model past
    // the budget — the 100 TB web-corpus shape) the lookups fall back
    // to the postings-style shuffle-hash joins, never a sort-merge or
    // nested loop over the occurrence stream
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val pBig = plan(queries.CorpusQueries.ngramLmScore(spark, sf))
      assert(pBig.contains("ShuffledHashJoin"), pBig.take(4000))
    } finally spark.conf.set(key, saved)
    // the only nested-loop allowed is the broadcast of the 1-row vocab
    // aggregate; an unbounded corpus cross join would be a scale bug
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }.foreach { j =>
      val bounded = Seq(j.left, j.right).exists(side =>
        side.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }.isDefined)
      assert(bounded, s"unbounded cross join in plan:\n$j")
    }
  }

  test("dsir_weights joins the B-row bucket stats by broadcast (no corpus shuffle for scoring)") {
    val p = plan(queries.CorpusQueries.dsirWeights(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    // the corpus-sized token stream must never sort-merge; the one SMJ
    // allowed is the constant B-row raw⋈target full-outer stats merge
    // (full outers can't broadcast), which is scale-independent
    p.linesIterator.filter(_.contains("SortMergeJoin")).foreach { l =>
      assert(l.contains("FullOuter"), s"corpus-sized SMJ leaked:\n$l")
    }
  }

  test("curriculum_order: no corpus-sized global window (two-pass rank)") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // worst case for the naive ROW_NUMBER() OVER (ORDER BY ...): the
    // whole corpus funnels into one task. The two-pass form may only
    // run an unpartitioned window over the bounded per-bucket counts.
    val docs = spark.range(1, 5001).toDF("doc_id")
      .withColumn("diff", col("doc_id") % 977)
    val ranked = operators.Curriculum.order(docs, col("doc_id"),
      col("diff"), buckets = 8)
    val wins = ranked.queryExecution.sparkPlan.collect {
      case w: WindowExec => w
    }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val bucketKeyed = w.partitionSpec.exists(
        _.references.exists(_.name == "__bucket"))
      val boundedInput =
        w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined
      assert(bucketKeyed || boundedInput,
        s"corpus-sized global window:\n$w")
    }
  }

  test("pagerank iteration joins are equi-joins; only the 1-row count crosses") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = queries.VectorQueries.pagerank(spark, sf)
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }.foreach { j =>
      // bounded cross sides: the 1-row node-count aggregate, or the
      // constant-k centroid machinery inside the blocked pair search
      import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalRelation}
      val bounded = Seq(j.left, j.right).exists(side =>
        side.collectFirst {
          case a: Aggregate if a.groupingExpressions.isEmpty => a
        }.isDefined ||
          side.collectFirst { case g: GlobalLimit => g }.isDefined ||
          side.collectFirst { case l: LocalRelation => l }.isDefined)
      assert(bounded, s"unbounded cross join in plan:\n$j")
    }
  }

  test("embedding_outliers broadcasts the per-group centroids") {
    val p = plan(queries.VectorQueries.embeddingOutliers(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(4000))
  }

  test("bm25_topk: query terms and corpus stats broadcast; rank window per term") {
    val df = queries.CorpusQueries.bm25TopK(spark, sf)
    val p = plan(df)
    // the 3-term query set and the 1-row (N, avgdl) stats must ride
    // broadcasts onto the postings — never shuffle the corpus for them
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    // no global (unpartitioned) window over the corpus: every window
    // here partitions by the query term
    wins.foreach(w => assert(w.partitionSpec.nonEmpty, w.toString))
  }

  test("semantic_dedup pair search is a cluster-keyed equi-join, not all-pairs") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join, LocalRelation}
    val df = queries.VectorQueries.semanticDedup(spark, sf)
    val p = plan(df)
    // the SemDeDup contract: within-cluster pairs only → shuffle hash
    // join keyed on cluster_id, partitioned across executors
    assert(p.contains("ShuffledHashJoin"), p.take(4000))
    // any conditionless join must have a constant-bounded side (the
    // k-row centroid LocalRelation from Ivf.train/assign)
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }.foreach { j =>
      val bounded = Seq(j.left, j.right).exists(side =>
        side.collectFirst { case g: GlobalLimit => g }.isDefined ||
          side.collectFirst { case l: LocalRelation => l }.isDefined)
      assert(bounded, s"unbounded cross join in plan:\n$j")
    }
  }

  test("scalar_subquery decorrelates to equi-joins — never a nested loop over the value domain") {
    // the guard that keeps this query out of the scale-killer shape:
    // an inequality-correlated aggregate would decorrelate to a
    // BroadcastNestedLoopJoin over distinct values (measured quadratic)
    val p = plan(queries.RelationalQueries.scalarSubquery(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.take(3000))
  }

  test("count_min_merge: the constant-size sketch broadcasts to the estimate join") {
    val p = plan(queries.AdvancedQueries.countMinMerge(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      p.take(3000))
  }

  test("scd2_build: both windows and the change-point filter share ONE exchange + sort") {
    val p = plan(queries.EventQueries.scd2Build(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    val sorts = "(?m)^\\s*[+:]?- Sort ".r.findAllIn(p).size
    assert(exchanges == 1,
      s"lag and lead must share one shuffle, got $exchanges:\n${p.take(3000)}")
    assert(sorts == 1,
      s"the filter preserves the sort; lead must not re-sort, got $sorts:\n${p.take(3000)}")
  }

  test("funnel_steps: every stage is an entity-keyed equi-join/agg, nothing unbounded") {
    val p = plan(queries.EventQueries.funnelSteps(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"funnel must stay equi-joined:\n${p.take(3000)}")
    // every shuffle keys on the entity column — one partitioning serves
    // the whole stage chain (EnsureRequirements elides the repeats)
    val offKey = "Exchange hashpartitioning\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).filterNot(_.contains("user_id"))
    assert(offKey.isEmpty, offKey.mkString("\n"))
  }

  test("cohort_retention: first-day join keyed by user; cell agg is partial-agg friendly") {
    val p = plan(queries.EventQueries.cohortRetention(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"retention must stay equi-joined:\n${p.take(3000)}")
    // the user-key stages shuffle on user_id; only the final cell
    // aggregate may key on (cohort_day, week_offset)
    val keys = "Exchange hashpartitioning\\(([^)]*)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(k =>
      k.contains("user_id") || k.contains("cohort_day")), keys.mkString("\n"))
  }

  test("shard write: assignment + replay sort + write plan exactly ONE " +
    "exchange and no global sort — the shuffle IS the shard write") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source")
    val pre = operators.Shard.shardedForWrite(docs, col("doc_id"),
      numShards = 8, epoch = 0)
    val p = plan(pre)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"shard write must be a single shuffle, got $exchanges:\n${p.take(3000)}")
    assert(p.contains("hashpartitioning(shard"),
      s"the one exchange must key on shard:\n${p.take(3000)}")
    // a global sort would surface as rangepartitioning (TeraSort shape)
    // or a single-partition collapse — both are the plans this operator
    // exists to avoid at 100 TB
    assert(!p.contains("rangepartitioning") && !p.contains("SinglePartition"),
      s"global sort leaked into the shard path:\n${p.take(3000)}")
    // exactly the window's local sort survives: the explicit
    // sortWithinPartitions restating the replay order is removed as
    // redundant (its (shard, __shkey) prefix is the window's ordering)
    val sorts = "(?m)^\\s*[+:]?- Sort ".r.findAllIn(p).size
    assert(sorts == 1,
      s"replay-order sort must fold into the window's, got $sorts:\n${p.take(3000)}")
  }

  test("corpus_diff: both snapshot sides fold to (id, fingerprint, " +
    "presence) BEFORE the full-outer join — no text column is shuffled") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = queries.CorpusQueries.corpusDiff(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, "diff must be a join")
    val allowed = Set("id", "__fp_old", "__fp_new", "__in_old", "__in_new")
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val out = side.output.map(_.name)
        assert(out.forall(allowed), s"join side ships more than the " +
          s"32-byte fingerprint tuple: $out\n$j")
      }
    }
  }

  test("bloom_membership: the <=m-row filter broadcasts; no text " +
    "column reaches the probe join or the per-id aggregate") {
    val df = queries.CorpusQueries.bloomMembership(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p.take(4000))
    // the probe join and everything above it carry (id, position)
    // pairs only — the document text must be consumed by the scan-side
    // projection, never shuffled or joined
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val opt = df.queryExecution.optimizedPlan
    opt.collect { case j: Join => j }.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val out = side.output.map(_.name)
        assert(!out.contains("text"),
          s"probe join ships the text column: $out\n$j")
      }
    }
    opt.collect { case a: Aggregate => a }.foreach { a =>
      val keys = a.groupingExpressions.flatMap(_.references.map(_.name))
      assert(!keys.contains("text"),
        s"aggregate keys on the text column: $keys")
    }
  }
}
