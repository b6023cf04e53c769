package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition by iterative peeling (north-star scope:
  * graph-structured corpus curation — the k-core is the maximal
  * subgraph where every node keeps ≥ k neighbors, the standard
  * dense-cluster extraction for similarity/link graphs; peeling is the
  * textbook fixpoint: repeatedly delete nodes of degree < k, which can
  * cascade as deletions lower neighbors' degrees).
  *
  * Fixed `rounds` of peeling, every step a DataFrame op: one degree
  * aggregate + two equi-joins per round against WHICHEVER SIDE OF THE
  * PEEL FRONTIER IS SMALLER — LEFT SEMI on the survivors (`deg ≥ k`)
  * or LEFT ANTI on the peeled (`deg < k`); semantically identical
  * (every edge endpoint carries a degree, so endpoint ∈ keep ⟺
  * endpoint ∉ bad), and the choice is made per round from one
  * node-sized count: early rounds of an aggressive k peel most nodes
  * (semi on the small survivor set wins), late rounds peel almost
  * none (anti on the near-empty bad set wins, AQE broadcasts it and
  * the edge set stops shuffling at all). All joins hash-partitioned
  * with map-side partials, no driver data movement beyond the 2-long
  * frontier count. A fixed round count keeps the
  * plan deterministic and the oracle unrollable. Each round CHECKPOINTS
  * (not merely persists): a round's plan references the previous
  * edge set THREE times (degree aggregate + both semi-join probes), so
  * a persist-only loop still grows the LOGICAL tree ~3× per round —
  * 3^rounds analysis blowup, measured as a driver heap OOM at 6 rounds
  * on an 870-edge graph — while checkpointing truncates lineage to a
  * flat scan per round (the [[Components]] contract: `checkpointDir`
  * for reliable cluster checkpoints, localCheckpoint otherwise).
  * Callers wanting the exact fixpoint raise `rounds` until the spec's
  * convergence flag holds — at these densities the cascade settles in
  * ≤4 peels (KCoreSpec pins a hand-built cascade).
  */
object KCore {

  /** @param edges canonical undirected edges (a, b), a < b, deduped
    * @return (node, deg, in_core) for every node still carrying an
    *         edge after `rounds` peels; `deg` is the degree within the
    *         surviving subgraph, `in_core` = deg ≥ k (all true ⇔ the
    *         peeling converged to the true k-core). */
  def peel(edges: DataFrame, k: Int, rounds: Int,
           checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && rounds >= 1)
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    def pin(e: DataFrame): DataFrame = {
      val p = e.persist(StorageLevel.MEMORY_AND_DISK)
      if (checkpointDir.isDefined) p.checkpoint(true)
      else p.localCheckpoint(true)
    }

    var cur = pin(edges.select("a", "b"))
    // each pin() materializes, so count() below reads cached blocks —
    // one cheap action per round buys fixpoint detection: once a peel
    // removes no edge, every further peel is the identity, so the
    // remaining rounds are skipped with an identical result (rounds
    // stays the semantic upper bound the caller/oracle declares)
    var curCount = cur.count()
    var converged = false
    (1 to rounds).foreach { _ =>
      if (!converged) {
        val degs = degrees(cur).persist(StorageLevel.MEMORY_AND_DISK)
        val cnt = degs.agg(
          coalesce(sum(when(col("deg") < k, 1L).otherwise(0L)), lit(0L))
            .as("nbad"),
          count(lit(1)).as("nall")).head()
        val nBad = cnt.getLong(0)
        val antiOnBad = nBad <= cnt.getLong(1) - nBad
        val (frontier, joinType) =
          if (antiOnBad) (degs.filter(col("deg") < k), "left_anti")
          else (degs.filter(col("deg") >= k), "left_semi")
        val side = frontier.select("node")
        val next = pin(cur
          .join(side.withColumnRenamed("node", "a"), Seq("a"), joinType)
          .join(side.withColumnRenamed("node", "b"), Seq("b"), joinType)
          .select("a", "b"))
        degs.unpersist()
        val nextCount = next.count()
        cur.unpersist()
        cur = next
        converged = nextCount == curCount
        curCount = nextCount
      }
    }
    degrees(cur)
      .select(col("node"), col("deg").cast("long").as("deg"),
        (col("deg") >= k).as("in_core"))
  }
}
