package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting + local clustering coefficient over an undirected
  * graph (north-star scope: graph-structured corpus/catalog analytics —
  * a node embedded in many closed triads is a hub of a tightly-knit
  * cluster; the coefficient is the classic cohesion score).
  *
  * Scale design — degree-ordered orientation + ADJACENCY INTERSECTION
  * (the compact form of the distributed wedge method, cf. Suri &
  * Vassilvitskii "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11): orient every edge from its lower-(degree, id)
  * endpoint to the higher one, build each node's SORTED out-neighbor
  * array (length O(√m) by orientation even on power-law graphs), and
  * close triangles per oriented edge (u→v) as
  * `array_intersect(N+(u), N+(v))` — every triangle materializes
  * exactly once, at its orientation-minimal edge.
  *
  * Why intersection instead of materializing the wedge table: the
  * wedge set is Σ C(d_out, 2) ROWS — measured 4.1B rows (~2 decades of
  * shuffle spill) on the sf10 co-purchase graph, shuffled TWICE (once
  * into the closure join, once into the per-node aggregate). The
  * adjacency form ships each out-array once per incident edge instead
  * (Σ d_out per side — the EDGE count, not the wedge count), the
  * intersection runs in-task over two bounded sorted arrays, and the
  * per-node aggregate sees 2·|E| endpoint rows plus one row per
  * triangle. Same O(m^{3/2}) work bound, a fraction of the bytes
  * moved. (Measured at sf10: 1256 s → see BASELINE.md.)
  *
  * Shuffle inventory (the whole op): degree aggregate, two joins
  * attaching degrees, one groupBy building adjacency arrays, two
  * equi-joins attaching the (node-sized) adjacency table to the edge
  * list, final per-node aggregate with map-side partials — all
  * hash-partitioned, no broadcast of anything data-sized, no cross
  * join (pinned in PlanShapeSpec). Hot dst keys in the attach joins
  * are AQE skew-split; the arrays they replicate are O(√m) bounded.
  */
object Triangles {

  /** Per-node triangle counts and local clustering coefficient.
    *
    * @param edges canonical undirected edge list: columns (a, b) with
    *              a < b; duplicate-free when `preDeduped` (the default
    *              — a multigraph would double-count closures)
    * @param localThreshold edge count at or below which the census runs
    *              DRIVER-LOCAL on the collected edge list (the
    *              [[Components.connected]] `localThreshold` contract):
    *              2M edges ≈ 32 MB of longs — broadcast-threshold
    *              scale, and below it the six shuffles of the
    *              distributed census (degree agg, orientation joins,
    *              adjacency build + two O(√m)-array attach joins,
    *              closure aggregate) are pure overhead against an
    *              in-memory intersect that the driver finishes in
    *              tenths of a second on all cores. Identical
    *              orientation/intersection algorithm, bit-identical
    *              output (TrianglesSpec pins local == distributed).
    *              Above the threshold the distributed census runs
    *              unchanged — the 100 TB path. 0 forces distributed.
    * @param preDeduped set false when `edges` may carry duplicate
    *              (a, b) rows (e.g. a relational pair-generation whose
    *              global `.distinct()` would cost a full extra
    *              shuffle): the census dedups INTERNALLY — an O(1)
    *              hash-set membership test during the driver-local
    *              ingest (the pair stream is already in hand; at the
    *              gate SF the skipped exchange is ~40% of the whole
    *              query), a `.distinct()` over the already-persisted
    *              edge cache on the distributed path (same exchange
    *              the caller would have paid, just moved after the
    *              size probe). The local/distributed threshold then
    *              compares the RAW pair count — a conservative upper
    *              bound of the true edge count.
    * @param edgeCountHint caller-known upper bound on the RAW pair
    *              stream's row count, duplicates included (e.g. from a
    *              join-free aggregate over the pair generator —
    *              Σ C(n_group, 2) costs one tiny shuffle, never touches
    *              the pair stream, and counts every generated pair).
    *              Enforced, not trusted: the small path's collect is
    *              capped at hint+1 rows and overflow falls back to the
    *              distributed census. When given, the
    *              local/distributed choice is made WITHOUT
    *              materializing the edges: the small path collapses
    *              to a single collect job (no persist, no count), and
    *              the big path never caches the raw pre-distinct pair
    *              stream — deciding the plan from a statistic instead
    *              of from materialized data, which is the only version
    *              of this choice that survives 100 TB.
    * @return (node, deg, n_tri, clustering_coeff) for every node that
    *         appears in `edges`; coefficient = 2·tri / (deg·(deg−1)),
    *         0.0 for degree-1 nodes — both engines divide the same
    *         exact integers, so the double is identical. */
  def perNode(edges: DataFrame,
              localThreshold: Long = 2000000L,
              preDeduped: Boolean = true,
              edgeCountHint: Option[Long] = None): DataFrame = {
    val raw = edges.select(col("a"), col("b"))
    edgeCountHint match {
      case Some(n) if localThreshold > 0 && n <= localThreshold =>
        // small-by-hint: ONE job (the collect) — no persist, no count.
        // The hint's contract is an upper bound on the RAW pair-stream
        // row count (the callers' join-free Σ C(n_group, 2) statistic
        // counts generated pairs, duplicates included), and it is
        // ENFORCED rather than trusted: the collect is capped at n+1
        // rows, so a wrong hint costs one bounded job — the overflow
        // falls through to the distributed census instead of an
        // unbounded driver collect (driver memory stays ≤ n+1 rows
        // either way).
        val cap = math.min(n, Int.MaxValue - 2L).toInt
        val head = raw.limit(cap + 1).collect()
        if (head.length <= cap) return localPerNode(raw, preDeduped,
          collected = Some(head))
        System.err.println(s"Triangles.perNode: edgeCountHint $n " +
          s"exceeded by the raw pair stream — distributed census")
        return census(
          (if (preDeduped) raw else raw.distinct())
            .persist(StorageLevel.MEMORY_AND_DISK))
      case Some(_) =>
        // trusted-big: dedupe (if owed) straight off the stream into
        // the census's one edge cache; the raw pair stream is never
        // cached
        return census(
          (if (preDeduped) raw else raw.distinct())
            .persist(StorageLevel.MEMORY_AND_DISK))
      case None => ()
    }
    // no hint: the edge set feeds the size probe and then either path;
    // persist (the multi-consumer rule; lineage stays flat, no
    // iteration, so no checkpoint needed)
    val e0 = raw.persist(StorageLevel.MEMORY_AND_DISK)
    // one cheap job: materializes the cache every downstream consumer
    // needs anyway, and sizes the graph for the local/distributed choice
    if (e0.count() <= localThreshold) {
      val out = localPerNode(e0, preDeduped)
      e0.unpersist()
      return out
    }
    if (preDeduped) census(e0)
    else {
      // materialize the deduped cache off the raw one, then release
      // the raw — the big path must not hold two edge-sized caches
      // for the whole census
      val d = e0.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      d.count()
      e0.unpersist()
      census(d)
    }
  }

  /** Distributed census over a deduped, persisted edge cache. */
  private def census(e: DataFrame): DataFrame = {
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

    // sorted out-adjacency per node: NODE-sized table, arrays O(√m)
    val adj = oriented.groupBy(col("src").as("n"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))

    // close per oriented edge: w ∈ N+(u) ∩ N+(v) ⇒ triangle u→v→w;
    // inner joins are exact (an edge whose endpoint has no out-array
    // closes nothing). One explode attributes the triangle to all
    // three corners: u and v each gain |C|, every closing w gains 1.
    val perEdge = oriented
      .join(adj.select(col("n").as("src"), col("nbrs").as("__nu")), "src")
      .join(adj.select(col("n").as("dst"), col("nbrs").as("__nv")), "dst")
      .select(col("src"), col("dst"),
        array_intersect(col("__nu"), col("__nv")).as("__c"))
      .filter(size(col("__c")) > 0)
    val triCounts = perEdge
      .select(explode(concat(
        array(struct(col("src").as("node"), size(col("__c")).cast("long").as("cnt")),
          struct(col("dst").as("node"), size(col("__c")).cast("long").as("cnt"))),
        transform(col("__c"),
          w => struct(w.as("node"), lit(1L).as("cnt"))))).as("x"))
      .groupBy(col("x.node").as("node")).agg(sum(col("x.cnt")).as("n_tri"))

    deg.join(triCounts, Seq("node"), "left")
      .select(col("node"), col("deg").cast("long").as("deg"),
        coalesce(col("n_tri"), lit(0L)).cast("long").as("n_tri"))
      .withColumn("clustering_coeff",
        when(col("deg") >= 2,
          (col("n_tri") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Driver-local census over a collected (bounded — see
    * `localThreshold`) edge list: the SAME degree-ordered orientation +
    * sorted-adjacency intersection, on dense-remapped ids in flat
    * arrays, closure counting chunked across all cores. Semantics
    * identical to the distributed census (orientation by (deg, id)
    * with the id's natural order — the census is order-insensitive
    * beyond needing SOME strict total order, and the per-node counts
    * are exact integers either way). */
  private def localPerNode(e: DataFrame, preDeduped: Boolean,
                           collected: Option[Array[
                             org.apache.spark.sql.Row]] = None): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField,
      StructType}
    val spark = e.sparkSession
    val idType = e.schema("a").dataType
    val rows = collected.getOrElse(e.collect())
    // dense remap: original id -> [0, n)
    val idx = new java.util.HashMap[Any, Integer](rows.length * 2)
    val ids = new scala.collection.mutable.ArrayBuffer[Any]
    def ix(x: Any): Int = {
      var i = idx.get(x)
      if (i == null) { i = ids.length; idx.put(x, i); ids += x }
      i
    }
    val ea = new Array[Int](rows.length)
    val eb = new Array[Int](rows.length)
    // !preDeduped: dedupe during ingest — O(1) primitive-set
    // membership on the dense-packed pair ([[PackedPairSet]]), in
    // place of the caller's global distinct exchange (the dense ids
    // fit an Int each, so one Long ≥ 1 keys a pair)
    val seen: PackedPairSet =
      if (preDeduped) null else new PackedPairSet(rows.length)
    var m = 0
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      val u = ix(r.get(0)); val v = ix(r.get(1))
      if (seen == null ||
          seen.add((math.min(u, v).toLong << 32) | math.max(u, v).toLong)) {
        ea(m) = u; eb(m) = v; m += 1
      }
      i += 1
    }
    val n = ids.length
    val deg = new Array[Long](n)
    i = 0
    while (i < m) { deg(ea(i)) += 1; deg(eb(i)) += 1; i += 1 }
    // strict total order for orientation: (deg, id natural order)
    def less(u: Int, v: Int): Boolean =
      deg(u) < deg(v) || (deg(u) == deg(v) &&
        ids(u).asInstanceOf[Comparable[Any]].compareTo(ids(v)) < 0)
    // CSR out-adjacency, runs sorted by dense id (both intersect sides
    // sort by the same key, so the merge is exact)
    val outDeg = new Array[Int](n)
    val esrc = new Array[Int](m)
    val edst = new Array[Int](m)
    i = 0
    while (i < m) {
      val s = if (less(ea(i), eb(i))) ea(i) else eb(i)
      val d = if (s == ea(i)) eb(i) else ea(i)
      esrc(i) = s; edst(i) = d; outDeg(s) += 1; i += 1
    }
    val start = new Array[Int](n + 1)
    i = 0
    while (i < n) { start(i + 1) = start(i) + outDeg(i); i += 1 }
    val adj = new Array[Int](m)
    val fill = java.util.Arrays.copyOf(start, n)
    i = 0
    while (i < m) { adj(fill(esrc(i))) = edst(i); fill(esrc(i)) += 1; i += 1 }
    var v = 0
    while (v < n) { java.util.Arrays.sort(adj, start(v), start(v + 1)); v += 1 }
    // closure count, chunked over edges, one thread-local accumulator
    // per chunk (no atomics), merged below
    val cores = math.max(1, Runtime.getRuntime.availableProcessors)
    val chunks = java.util.stream.IntStream.range(0, cores).parallel()
      .mapToObj[Array[Long]] { p =>
        val local = new Array[Long](n)
        var j = (p.toLong * m / cores).toInt
        val hi = ((p + 1).toLong * m / cores).toInt
        while (j < hi) {
          val s = esrc(j)
          val d = edst(j)
          var pu = start(s)
          var pv = start(d)
          val eu = start(s + 1)
          val ev = start(d + 1)
          var c = 0L
          while (pu < eu && pv < ev) {
            val wu = adj(pu)
            val wv = adj(pv)
            if (wu == wv) { local(wu) += 1; c += 1; pu += 1; pv += 1 }
            else if (wu < wv) pu += 1
            else pv += 1
          }
          local(s) += c; local(d) += c
          j += 1
        }
        local
      }
      // merge SEQUENTIALLY — a parallel reduce with a mutable identity
      // array would hand the same array to several threads at once
      .collect(java.util.stream.Collectors.toList[Array[Long]])
    val tri = new Array[Long](n)
    chunks.forEach { c =>
      var k = 0
      while (k < n) { tri(k) += c(k); k += 1 }
    }
    val out = new java.util.ArrayList[Row](n)
    v = 0
    while (v < n) {
      val cc = if (deg(v) >= 2)
        (tri(v) * 2).toDouble / (deg(v) * (deg(v) - 1)).toDouble
      else 0.0
      out.add(Row(ids(v), deg(v), tri(v), cc))
      v += 1
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("node", idType), StructField("deg", LongType),
      StructField("n_tri", LongType),
      StructField("clustering_coeff", DoubleType))))
  }
}
