package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF (inverted-file) approximate nearest neighbour — the second scale
  * path for similarity search alongside [[Similarity.lshBucketTopK]]
  * (SURVEY §7.6: "an IVF or LSH-bucketed variant as the scale path").
  *
  * Train: k-means with DETERMINISTIC init (first k vectors by id) and a
  * fixed iteration count — reproducible across runs/engines, no RNG.
  * Every step is a DataFrame op: assignment is a corpus × centroids
  * cross join (centroids are tiny → broadcast) + `min_by`, centroid
  * update is posexplode + per-(cluster, dim) mean. Nothing is collected
  * to the driver.
  *
  * Search: route each query to its `nprobe` nearest centroids, then
  * score ONLY vectors in those clusters — the cross join shrinks by
  * ~k/nprobe. At 100 TB the assigned corpus is written
  * `partitionBy("cluster_id")` so probes prune partitions at scan time;
  * recall trades against nprobe exactly like any IVF index.
  */
object Ivf {

  private[operators] def dist2(a: Column, b: Column): Column = {
    // squared L2 via dots: |a|² − 2a·b + |b|² (same ranking as L2)
    VectorFunctions.dot(a, a) - lit(2.0) * VectorFunctions.dot(a, b) +
      VectorFunctions.dot(b, b)
  }

  /** Hard ceiling on k: [[localize]] collects the centroid table to the
    * driver once per training iteration, and the downstream `assign` /
    * `searchTopK` broadcast it — both are safe ONLY while the table is
    * driver-sized. 65536 centroids × a 4096-dim double vector is ~2 GB,
    * the practical broadcast limit; real IVF indexes sit at k ≈ √N
    * (1 B vectors → ~32k clusters), comfortably inside. Anything larger
    * is a different index design (hierarchical/sharded centroids), not
    * a bigger collect. */
  val MaxK = 65536

  /** Materialize a k-row centroid plan as a LocalRelation: one job, then
    * every downstream broadcast/reuse is instant — no persist+count
    * chains, no recompute when the centroids feed several joins. The
    * collect is CONSTANT-size (k rows, k ≤ [[MaxK]] ≪ corpus — enforced
    * in [[train]]), the same driver-side footprint any broadcast of
    * them would have. */
  private def localize(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** @param corpus (id LONG, vec ARRAY<DOUBLE>); returns
    * (cluster_id INT, centroid ARRAY<DOUBLE>). */
  def train(corpus: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    require(k >= 1 && k <= MaxK,
      s"k must be in [1, $MaxK] (the centroid table is collected to " +
        s"the driver once per iteration and broadcast by consumers — " +
        s"it must stay driver-sized), got $k")
    // seed: first k vectors by id — left as a SUBPLAN, not collected:
    // the first refinement's assignment broadcasts it inside its own
    // job, so train pays ONE driver barrier per iteration (the updated
    // centroid collect), not an extra up-front one
    var centroids = corpus.orderBy("id").limit(k)
      .select(row_number().over(Window.orderBy("id")).cast("int")
        .as("cluster_id"), col("vec").as("centroid"))
    var materialized = false
    (1 to iters).foreach { _ =>
      val assigned = assign(corpus, centroids)
      // decimal-exact per-dimension means: a double avg is summation-
      // order-dependent (partial aggregation), which would make training
      // irreproducible across engines and partitionings
      val next = assigned
        .select(col("cluster_id"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy("cluster_id", "pos")
        .agg(graft.functions.Exact.davg(col("v")).as("m"))
        .groupBy("cluster_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("sorted"))
        .select(col("cluster_id"),
          expr("transform(sorted, s -> s.m)").as("centroid"))
      centroids = localize(next)
      materialized = true
    }
    // iters = 0 (use-the-seeds): still hand back a LocalRelation so the
    // downstream assign/search broadcasts don't re-run the seed scan
    if (!materialized) localize(centroids) else centroids
  }

  /** Nearest centroid per vector: (id, vec, cluster_id). Ties on the
    * distance break to the smallest cluster_id (lexicographic struct
    * min) — deterministic across engines and partitionings. */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__d", dist2(col("vec"), col("centroid")))
      .groupBy("id")
      .agg(min(struct(col("__d"), col("cluster_id"))).as("__m"),
        first(col("vec")).as("vec"))
      .select(col("id"), col("__m.cluster_id").as("cluster_id"), col("vec"))

  /** Write the assigned corpus as the on-disk IVF index:
    * `partitionBy(cluster_id)` parquet. At 100 TB a probe reads ONLY its
    * `nprobe` cluster directories — Catalyst partition pruning turns the
    * ANN search into a scan of k/nprobe-th of the corpus (asserted in
    * PlanShapeSpec). */
  def writeIndex(assigned: DataFrame, path: String): Unit =
    assigned.write.partitionBy("cluster_id").mode("overwrite").parquet(path)

  /** The whole recall-vs-nprobe curve from ONE probe join: probe at
    * `nprobes.max`, keep each (query, cluster) pair's probe rank, score
    * the union of probed clusters once, then derive every sweep point
    * inside a single window pass — for each configured `np`, a running
    * count of rows with probe rank ≤ np (over the same total order
    * `(cosine DESC, id ASC)` the per-np search uses) IS the row's rank
    * within that np's candidate subset, because probe sets are NESTED
    * under one ordering (top-1 ⊆ top-2 ⊆ ... by construction) and ids
    * are unique per query (assign gives each vector one cluster). A row
    * emits for np exactly when it probes within np and its running
    * count is ≤ k — identical rows to N independent [[searchTopK]]
    * calls (pinned by IvfSpec), for one shuffle-hash join + one window
    * sort instead of N of each. At 100 TB this is also the honest
    * sizing-run shape: the index is probed once at the largest budget
    * under evaluation, not once per configuration. */
  def searchTopKSweep(queries: DataFrame, assigned: DataFrame,
                      centroids: DataFrame, k: Int,
                      nprobes: Seq[Int]): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1),
      s"nprobes must be non-empty positive, got $nprobes")
    val probeW = Window.partitionBy("qid")
      .orderBy(col("__qd").asc, col("cluster_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__qd", dist2(col("qvec"), col("centroid")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobes.max)
      .select(col("qid"), col("qvec"), col("cluster_id"), col("__pr"))
    val scored = probes.join(assigned.hint("shuffle_hash"), Seq("cluster_id"))
      .filter(col("qid") =!= col("id"))
      .withColumn("cosine", Similarity.cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = Seq(col("qid"), col("cluster_id"), col("id"), col("cosine"),
      col("__pr"))
    val withCnt = scored.select(base ++ nprobes.map(np =>
      sum(when(col("__pr") <= np, 1)).over(w).as(s"__c$np")): _*)
    val entries = nprobes.map(np => struct(
      lit(np).as("nprobe"),
      (col("__pr") <= np && col(s"__c$np") <= k).as("__q"),
      col(s"__c$np").cast("int").as("rank")))
    withCnt
      .select(col("qid"), col("cluster_id"), col("id"), col("cosine"),
        explode(array(entries: _*)).as("__e"))
      .filter(col("__e.__q"))
      .select(col("__e.nprobe").as("nprobe"), col("qid"),
        col("cluster_id"), col("id"), col("cosine"),
        col("__e.rank").as("rank"))
  }

  /** Top-k by cosine among the query's `nprobe` nearest clusters. */
  def searchTopK(queries: DataFrame, assigned: DataFrame,
                 centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val probeW = Window.partitionBy("qid")
      .orderBy(col("__qd").asc, col("cluster_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__qd", dist2(col("qvec"), col("centroid")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("qid"), col("qvec"), col("cluster_id"))
    // shuffle-hash, not sort-merge: cluster_id is a low-cardinality
    // partition key and nothing downstream needs its sort order
    val scored = probes.join(assigned.hint("shuffle_hash"), Seq("cluster_id"))
      .filter(col("qid") =!= col("id"))
      .withColumn("cosine", Similarity.cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cluster_id", "id", "cosine", "rank")
  }
}
