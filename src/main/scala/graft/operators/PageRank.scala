package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exact

/** PageRank over a document graph (north-star scope: graph-structured
  * corpus analytics — rank documents by how central they sit in a
  * similarity/link graph, e.g. to pick canonical representatives or
  * weight sources).
  *
  * Fixed-iteration power method, every step a DataFrame op:
  * contribution = pr/outdeg shipped along edges (one shuffle join per
  * iteration, keyed by src then grouped by dst), in-mass summed
  * DECIMAL-exactly ([[Exact.dsum]]) so the result is independent of
  * partitioning and bit-reproducible against a single-threaded oracle —
  * the same discipline as [[Components]]' deterministic label loop.
  * Dangling-node mass is dropped (not redistributed): the standard
  * simplification, documented so the oracle unrolls the identical
  * recurrence. Every arithmetic constant is computed ONCE in Scala and
  * interpolated into the oracle SQL, because e.g. `1.0 − 0.85` in
  * binary is NOT the double the literal `0.15` parses to.
  *
  * Scale shape: per iteration one equi-join edges⋈pr on src (shuffle
  * hash; edges carry precomputed outdeg) and one hash aggregate by dst
  * with map-side partial combine. The node frame with its 1-row count
  * rides a broadcast. Iterations are a fixed small constant — the plan
  * grows linearly, no driver data movement, no checkpoint needed below
  * ~10 iterations (beyond that, persist per round like Components).
  */
object PageRank {

  /** @param nodes one column `id` — the full vertex set (isolated
    *              vertices keep base rank)
    * @param edges directed (src, dst); symmetrize first for an
    *              undirected graph
    * @param checkpointDir reliable-checkpoint directory for cluster
    *              runs (the [[Components.connected]] contract: local
    *              checkpoint blocks die with their executor); None =
    *              localCheckpoint, fine on local mode
    * @return (id, pr) after `iters` power iterations. */
  def run(nodes: DataFrame, edges: DataFrame, iters: Int,
          damping: Double = 0.85,
          checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0)
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    val n1 = nodes.agg(count(lit(1)).as("n"))
    // the edge table feeds the outdeg aggregate AND its own join side
    // AND every iteration — a caller handing in a DERIVED edge set
    // (e.g. the near-dup pair search) would re-run that whole upstream
    // pipeline once per consumer (measured: 4.7 s → the edge pipeline
    // dominating a 2-iteration run). Checkpointing (not just persist)
    // both caches the rows AND truncates the lineage, so the per-
    // iteration plan references a flat scan instead of replicating the
    // edge pipeline's subtree per consumer — the Components rule for
    // anything consumed inside a loop.
    val e = {
      val p = edges.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (checkpointDir.isDefined) p.checkpoint(false)
      else p.localCheckpoint(false)
    }
    // outdeg precomputed once; the weighted edge table is itself read
    // once per iteration
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = nodes.crossJoin(broadcast(n1))
    var pr = base.select(col("id"), (lit(1.0) / col("n")).as("pr"))
    (1 to iters).foreach { _ =>
      val inMass = eo
        .join(pr.select(col("id").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("id").agg(Exact.dsum(col("c")).as("m"))
      pr = base.join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping)) / col("n") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
    }
    pr
  }
}
