package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-reproducible aggregates over doubles.
  *
  * Floating-point `sum(double)` depends on summation order, so a Spark
  * result (partial aggregation over 32 partitions) and a single-threaded
  * oracle (DuckDB) differ in the last ulps — enough to break hash-equality
  * checks. Casting each addend to a fixed-scale decimal makes the sum exact
  * integer arithmetic (order-independent and identical in every engine);
  * one final cast back to double is a single deterministic IEEE rounding.
  *
  * The per-row cast double→decimal(30,10) discards information below 1e-10,
  * which is far above the noise floor we are eliminating and identical in
  * both engines. Values must stay below 1e20 (true for all test data and
  * any realistic metric column).
  *
  * Scale note: decimal sums use Spark's built-in Decimal aggregate, which
  * still benefits from partial (map-side) aggregation and whole-stage
  * codegen; the cost over a double sum is a constant factor on the
  * aggregation buffer, not a change in shuffle volume.
  */
object Exact {
  /** Fixed-point type wide enough for sums over billions of rows. */
  val DecimalT = "decimal(30,10)"

  /** Exact sum, returned as double: SUM(CAST(x AS DECIMAL(30,10)))::DOUBLE */
  def dsum(c: Column): Column = sum(c.cast(DecimalT)).cast("double")

  /** Exact-sum mean: dsum(x) / count(x); division is one IEEE op. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact-moment sample variance via (Σx² − (Σx)²/n)/(n−1).
    * Matches an oracle computing the same closed form; NOT Welford — the
    * point is bit-reproducibility, and the oracle SQL uses this formula too.
    * Returns null for n < 2 (like stddev_samp).
    */
  def dvarSamp(c: Column): Column = {
    val n = count(c)
    val sx = dsum(c)
    val sxx = dsum(c * c)
    when(n < 2, lit(null).cast("double"))
      .otherwise((sxx - sx * sx / n) / (n - lit(1)))
  }

  /** Exact-moment sample stddev; clamps tiny negative variance (cancellation). */
  def dstddevSamp(c: Column): Column =
    sqrt(greatest(dvarSamp(c), lit(0.0)))

  /** DuckDB SQL fragment equivalents, used when authoring oracle queries.
    *
    * Both directions of the double↔decimal conversion route through
    * VARCHAR to match JVM semantics bit-for-bit:
    *  - decimal→double: DuckDB's native DECIMAL(>18)→DOUBLE computes
    *    int128/10^s in double arithmetic (two roundings, off by ulps);
    *    VARCHAR→DOUBLE uses strtod (correctly rounded), matching
    *    BigDecimal.doubleValue on the Spark side.
    *  - double→decimal: Spark's Cast uses BigDecimal.valueOf(d) — the
    *    SHORTEST decimal string of the double, then HALF_UP at scale 10.
    *    DuckDB's native cast quantizes the exact binary value, which can
    *    land on the other side of a rounding boundary (observed ±1e-10 on
    *    long-tailed products like ppt×frac); DOUBLE→VARCHAR prints the
    *    same shortest string, so casting that to DECIMAL reproduces the
    *    JVM result exactly.
    */
  object sql {
    def dsum(x: String): String =
      s"CAST(CAST(SUM(CAST($x AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"

    /** VARCHAR-routed input cast — required ONLY when the addends are
      * doubles with long decimal tails (e.g. products of two "wild"
      * doubles like ppt×frac), where DuckDB's native double→decimal
      * quantizes the exact binary value while the JVM quantizes the
      * shortest decimal string and the two land on opposite sides of the
      * scale-10 boundary (~0.3% of rows). The string round-trip costs
      * ~10× on the DuckDB side, so reserve it for oracles that need it;
      * money-like values (≤2-3 decimal digits) are exact either way. */
    def dsumStr(x: String): String =
      s"CAST(CAST(SUM(CAST(CAST($x AS VARCHAR) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"
    def davg(x: String): String = s"(${dsum(x)} / COUNT($x))"
    def dvarSamp(x: String): String =
      s"(CASE WHEN COUNT($x) < 2 THEN NULL ELSE " +
        s"(${dsum(s"($x)*($x)")} - ${dsum(x)}*${dsum(x)}/COUNT($x)) / (COUNT($x)-1) END)"
    def dstddevSamp(x: String): String =
      s"SQRT(GREATEST(${dvarSamp(x)}, 0.0))"

    /** Variance/stddev with the SQUARED addends routed via VARCHAR:
      * x² is a product of "wild" doubles even when x itself is short-
      * decimal, so Σx² is the term that hits the quantization-boundary
      * divergence dsumStr exists for (measured: 1 poisoned x² in 1M
      * events rows at sf0.1 shifts its group's σ by an ulp). The plain
      * Σx stays on the fast path. */
    def dvarSampStr(x: String): String =
      s"(CASE WHEN COUNT($x) < 2 THEN NULL ELSE " +
        s"(${dsumStr(s"($x)*($x)")} - ${dsum(x)}*${dsum(x)}/COUNT($x)) / (COUNT($x)-1) END)"
    def dstddevSampStr(x: String): String =
      s"SQRT(GREATEST(${dvarSampStr(x)}, 0.0))"

    /** Spark-semantics exact percentile over a pre-sorted DuckDB list
      * `l` with element count `n`: both engines interpolate two-sided
      * (`(hi−r)·v_lo + (r−lo)·v_hi`), but Spark's counts-map SHORT-
      * CIRCUITS when both straddle keys are the same value while
      * DuckDB's quantile_cont interpolates anyway — an ulp artifact on
      * duplicate-heavy groups (`0.8·1.82 + 0.2·1.82 ≠ 1.82`). This
      * fragment reproduces the shortcut, making percentile oracles
      * scale-stable. */
    def sparkPercentile(l: String, n: String, p: String): String = {
      val r = s"(CAST($p AS DOUBLE) * ($n - 1))"
      val vlo = s"$l[CAST(floor($r) AS BIGINT) + 1]"
      val vhi = s"$l[CAST(ceil($r) AS BIGINT) + 1]"
      s"(CASE WHEN $vlo = $vhi THEN $vlo " +
        s"ELSE (ceil($r) - $r) * $vlo + ($r - floor($r)) * $vhi END)"
    }
  }
}
