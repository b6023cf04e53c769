package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism floor for per-row CPU kernels (guide §2.5: "input
  * skew — one huge unsplittable file: repartition immediately after the
  * read").
  *
  * A small parquet file (one row group) scans as ONE task no matter how
  * many cores the session has, so any CPU-heavy per-row kernel stage
  * downstream of it — codec decode, BPE encode, replace chains — runs
  * single-threaded while the rest of the box idles. `spark.sql.files.
  * minPartitionNum` cannot fix this (extra byte-range splits of a
  * single row group come back empty).
  *
  * [[up]] repartitions ONLY when the input has fewer partitions than
  * the session's `defaultParallelism` (= total cluster cores on a real
  * deployment — scale-adaptive, not a local constant): at scale the
  * scan already yields >= cores splits and this is the identity, never
  * an added exchange on a big input. Callers pass small proxy rows
  * (ids, dimensions, single words), so the exchange moves metadata, not
  * payloads (guide §2.3). With `keys`, partitioning is deterministic
  * hash (no sort-before-repartition pass); keyless falls back to
  * round-robin.
  */
object Spread {
  /** The `df.rdd.getNumPartitions` probe pays a physical-planning pass
    * per CALL; queries that spread several inputs (bigram LM sides,
    * BM25's tf + dl) were paying it on every construction. Memoize per
    * (session, analyzed-plan semantic hash) — the count is a property
    * of the scan layout, not the call site. A hash collision could only
    * mis-decide WHETHER to repartition (performance, never results). */
  private val partsCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Integer]()

  private def inputParts(df: DataFrame): Int =
    partsCache.computeIfAbsent(
      (System.identityHashCode(df.sparkSession),
        df.queryExecution.analyzed.semanticHash()),
      _ => df.rdd.getNumPartitions).intValue()

  def up(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (inputParts(df) >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
