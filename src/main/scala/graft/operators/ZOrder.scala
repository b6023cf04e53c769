package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional data skipping for
  * the 100 TB scan path (public technique: interleave the bits of the
  * clustering keys so ONE sort order gives locality in EVERY key, and
  * parquet row-group min/max stats prune on all of them at once;
  * single-column sort orders prune only their leading column).
  *
  * The z-value is pure integer bit arithmetic (the classic
  * spread-merge magic-mask chain), so it is bit-identical in every
  * engine and oracle-checkable — the [[graft.functions.Exact]]
  * discipline applied to layout. Values are masked to 16 bits per
  * dimension (callers bucket/scale wider domains first; 16 bits ≈ 65k
  * cells per axis is far finer than row-group granularity needs).
  *
  * [[writeZOrdered]] is the layout sink: range-partition by z (files
  * cover disjoint z-ranges → disjoint (x, y) boxes), sort within
  * partitions (row groups inside each file stay tight), drop the
  * helper column. ScanPruningSpec measures the effect: a box filter
  * materializes a fraction of the rows a round-robin layout reads.
  */
object ZOrder {

  /** (shift, mask) steps spreading a 16-bit value over 32 bits (one
    * zero bit between payload bits) — shared with the SQL fragment so
    * engine and oracle can never drift. */
  val spreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L,
    1 -> 0x55555555L)

  /** Bit-spread of the low 16 bits of `c` (long arithmetic). */
  def spread16(c: Column): Column =
    spreadSteps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 2-D Morton code of the low 16 bits of (x, y). */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The identical computation as a DuckDB SQL expression over column
    * expressions `x`, `y` (BIGINT bit ops). */
  def zValue2Sql(x: String, y: String): String = {
    def spread(e: String): String =
      spreadSteps.foldLeft(s"(CAST($e AS BIGINT) & 65535)") {
        case (acc, (s, m)) => s"(($acc | ($acc << $s)) & $m)"
      }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  /** Write `df` z-clustered on (x, y) into `numFiles` z-range files,
    * rows z-sorted inside each — the layout whose row-group stats prune
    * box predicates on BOTH axes. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
                    numFiles: Int): Unit =
    df.withColumn("__z", zValue2(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write with parquet BLOOM FILTERS on `bloomCols` — the point-lookup
    * complement to the z-layout: min/max stats prune RANGES but are
    * useless for `key = v` on a high-cardinality column scattered
    * across row groups; a bloom filter lets the reader skip every row
    * group that provably lacks the key (false-positive rate bounds the
    * extra reads). `ndv` sizes the filters (expected distinct values
    * per row group). */
  def writeWithBloom(df: DataFrame, bloomCols: Seq[String], path: String,
                     numFiles: Int, ndv: Long = 100000L): Unit = {
    val w = df.repartition(numFiles).write.mode("overwrite")
    val opts = bloomCols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString))
    opts.foldLeft(w) { case (wr, (k, v)) => wr.option(k, v) }
      .parquet(path)
  }
}
