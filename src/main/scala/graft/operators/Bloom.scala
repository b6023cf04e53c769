package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership sketch — the bounded-size, mergeable,
  * engine-portable form of "is this item in that set" that a 100 TB
  * decontamination pass actually ships: build a filter over the
  * benchmark/blocklist side once (kilobytes), broadcast it, and
  * probe the corpus with zero shuffle of the corpus itself. False
  * positives only (tunable via k/m), never false negatives — the
  * safe direction for decontamination, where a false positive merely
  * drops a clean document.
  *
  * Representation: the filter is the DISTINCT SET of set bit
  * positions as a relation `(p INT)` with at most `m` rows — a bit
  * array in relational form. That makes it
  *  - mergeable: union-distinct folds partial filters (the [[CountMin]]
  *    / [[Histogram]] partial-merge law, here over bit positions);
  *  - bounded: ≤ m rows regardless of corpus size (m ≤ 65536);
  *  - engine-portable and oracle-checkable: positions derive from md5
  *    hex arithmetic (like [[Shard]]), so any engine — and the DuckDB
  *    oracle via [[sqlPositions]] — sets and probes identical bits.
  *
  * Scale shape: BUILD is one map-side-combinable distinct over k
  * position rows per inserted item; PROBE broadcasts the ≤m-row
  * filter and aggregates hits per item — corpus-sized data crosses
  * the wire exactly once, keyed by item id.
  */
object Bloom {

  private def require_(k: Int, m: Int): Unit = {
    require(k >= 1 && k <= 8,
      s"k must be in [1, 8] (md5 supplies 8 independent 16-bit lanes), got $k")
    require(m >= 2 && m <= 65536,
      s"m must be in [2, 65536] (positions are 16-bit lanes mod m), got $m")
  }

  /** The k bit positions of a value: lane i is hex chars [4i, 4i+4) of
    * md5(value) parsed as an int, mod m — deterministic, uniform, and
    * reproducible in any engine with md5 (cross-engine bit-identity is
    * the same property [[Shard.shardOf]] leans on). Duplicate
    * positions (two lanes colliding mod m) are removed so build and
    * probe agree on the DISTINCT-position contract. */
  def positions(value: Column, k: Int, m: Int): Column = {
    require_(k, m)
    val h = md5(value.cast("string"))
    array_distinct(array((0 until k).map(i =>
      (conv(substring(h, i * 4 + 1, 4), 16, 10).cast("int") % m)): _*))
  }

  /** Build the filter over `df`'s `value` column: the distinct set of
    * positions, ≤ m rows. NULL values are skipped (a NULL key is not a
    * member of anything — the [[Sample]]/[[Shard]] rule). */
  def build(df: DataFrame, value: Column, k: Int, m: Int): DataFrame =
    df.filter(value.isNotNull)
      .select(explode(positions(value, k, m)).as("p"))
      .distinct()

  /** Merge partial filters (any number): union-distinct of positions —
    * exactly the bit-OR of the underlying arrays. */
  def merge(filters: DataFrame*): DataFrame =
    filters.reduce(_ unionAll _).distinct()

  /** Probe: `(id, maybe_member)` — true iff ALL of the item's
    * positions are set in `filter`. The filter is bounded (≤ m rows)
    * so it BROADCASTS, and only `(id, position)` pairs reach the
    * per-id aggregate — the value column (often full document text)
    * never shuffles. Guarantees: no false negatives; false positive
    * odds ≈ (bits_set/m)^k. NULL values probe `false` (no positions).
    *
    * @param id unique item key (callers join the verdict back by it)
    * @param value the membership key expression */
  def probe(items: DataFrame, id: Column, value: Column,
            filter: DataFrame, k: Int, m: Int): DataFrame = {
    require_(k, m)
    val withPos = items.select(id.as("id"),
      when(value.isNotNull, positions(value, k, m))
        .otherwise(array().cast("array<int>")).as("__ps"))
    // LEFT join so items with zero hits survive; count matched
    // positions and compare to the item's own distinct-position count
    // DISTINCT the filter's positions defensively: callers may supply a
    // filter relation read from arbitrary parquet, and duplicate `p`
    // rows would multiply join matches (__nh > __np), turning the
    // membership test FALSE for true members — a false negative,
    // violating the operator's central guarantee. The dedup is free
    // (the relation is ≤ m ≤ 65536 rows by contract).
    withPos.select(col("id"), size(col("__ps")).as("__np"),
        explode_outer(col("__ps")).as("p"))
      .join(broadcast(filter.select(col("p")).distinct()
          .withColumn("__hit", lit(1))),
        Seq("p"), "left")
      .groupBy("id")
      .agg(max(col("__np")).as("__np"), count(col("__hit")).as("__nh"))
      .select(col("id"), (col("__np") > 0 && col("__nh") === col("__np"))
        .as("maybe_member"))
  }

  /** Stateless membership verdict as a pure Column over a DRIVER-SIDE
    * position set — the literal-broadcast form for STREAMING probes,
    * where [[probe]]'s join+aggregate would create state per
    * micro-batch. `bits` is a materialized [[build]] result (bounded:
    * ≤ m ≤ 65536 ints — the same driver-sized-constant contract as
    * [[Ivf.MaxK]] centroids). Same truth table as [[probe]]: NULL
    * values read false, membership iff every position is set. */
  def memberExpr(value: Column, bits: Seq[Int], k: Int, m: Int): Column = {
    require_(k, m)
    require(bits.size <= m, s"filter has ${bits.size} positions > m=$m")
    val set = typedLit(bits.sorted)
    when(value.isNull, lit(false))
      .otherwise(forall(positions(value, k, m),
        p => array_contains(set, p)))
  }

  /** The k position expressions of `expr` as DuckDB SQL fragments
    * (lane i of md5's hex), value-equal to [[positions]] by
    * construction — strpos hex parse because DuckDB lacks `conv`
    * (the [[Shard.sqlShard]] idiom). Oracles UNION one
    * `SELECT <lane> AS p FROM ...` per fragment and DISTINCT the
    * result to reproduce the filter / an item's position set. */
  def sqlPositionLanes(expr: String, k: Int, m: Int): Seq[String] = {
    require_(k, m)
    val hx = s"md5(CAST($expr AS VARCHAR))"
    (0 until k).map { i =>
      val terms = (1 to 4).map { j =>
        val w = 1 << (4 * (4 - j))
        s"(strpos('0123456789abcdef', substr($hx, ${i * 4 + j}, 1)) - 1) * $w"
      }.mkString(" + ")
      s"CAST(($terms) % $m AS INT)"
    }
  }
}
