package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting + local clustering coefficient over an undirected
  * graph (north-star scope: graph-structured corpus/catalog analytics —
  * a node embedded in many closed triads is a hub of a tightly-knit
  * cluster; the coefficient is the classic cohesion score).
  *
  * Scale design — the degree-ordered orientation (public standard for
  * distributed triangle enumeration, e.g. the MapReduce formulation in
  * Suri & Vassilvitskii "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11): orient every edge from its lower-(degree, id)
  * endpoint to the higher one, then build wedges only AROUND the low
  * endpoint. Each triangle then materializes exactly once (at its
  * minimum-order vertex), and — the scale property — the oriented
  * out-degree is bounded by O(√m) even when the raw degree distribution
  * is power-law, so the wedge self-join has no hot reducer: the natural
  * shuffle-key skew of a celebrity node is capped by construction,
  * no salting needed. Everything is exact integer arithmetic until the
  * final coefficient division, so results are partitioning-independent
  * and bit-reproducible against a single-threaded oracle.
  *
  * Shuffle inventory (the whole op): degree aggregate, two joins
  * attaching degrees, wedge self-join keyed by apex, closure equi-join
  * against the canonical edge set, final per-node aggregate — all
  * hash-partitioned equi-joins/aggregates with map-side partials; no
  * broadcast of anything data-sized, no cross join (pinned in
  * PlanShapeSpec).
  */
object Triangles {

  /** Per-node triangle counts and local clustering coefficient.
    *
    * @param edges canonical undirected edge list: columns (a, b) with
    *              a < b, no duplicates (callers dedup; a multigraph
    *              would double-count closures)
    * @return (node, deg, n_tri, clustering_coeff) for every node that
    *         appears in `edges`; coefficient = 2·tri / (deg·(deg−1)),
    *         0.0 for degree-1 nodes — both engines divide the same
    *         exact integers, so the double is identical. */
  def perNode(edges: DataFrame): DataFrame = {
    // the edge set feeds the degree aggregate, the orientation join and
    // the closure join — three consumers, so persist (the multi-consumer
    // rule; lineage stays flat, no iteration, so no checkpoint needed)
    val e = edges.select(col("a"), col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // total order for orientation: (deg, id) — ties broken by id so the
    // order is strict and every edge gets exactly one direction
    val oriented = e
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      .select(when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("d")))
        .otherwise(struct(col("b").as("s"), col("a").as("d"))).as("o"))
      .select(col("o.s").as("src"), col("o.d").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // wedges at the apex (out-degree ≤ O(√m) by orientation); v < w by
    // id so the closure edge is already in canonical (a, b) form
    val wedges = oriented.select(col("src").as("u"), col("dst").as("v"))
      .join(oriented.select(col("src").as("u"), col("dst").as("w")), "u")
      .filter(col("v") < col("w"))
    val tris = wedges
      .join(e.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"))

    val triCounts = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

    deg.join(triCounts, Seq("node"), "left")
      .select(col("node"), col("deg").cast("long").as("deg"),
        coalesce(col("n_tri"), lit(0L)).cast("long").as("n_tri"))
      .withColumn("clustering_coeff",
        when(col("deg") >= 2,
          (col("n_tri") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }
}
