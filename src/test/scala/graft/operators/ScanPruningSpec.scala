package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The z-order layout's data-skipping effect, MEASURED: a box filter
  * over a z-clustered table must materialize a small fraction of the
  * rows the same filter reads from a round-robin layout — row-group
  * min/max stats prune on both axes only when one sort order carries
  * both. (The z-VALUE's cross-engine bit-equality is the `zorder_key`
  * oracle's job; this spec is about the physical read path.)
  */
class ScanPruningSpec extends SparkSpecBase {

  /** Rows the parquet reader actually materialized (post row-group
    * skip, pre exact filter). */
  private def rowsRead(df: DataFrame): Long = {
    df.collect() // finalize the (possibly adaptive) execution
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes a 2-D box filter; round-robin reads ~everything") {
    val n = 100000L
    // two independent uniform axes — deliberately uncorrelated, the
    // case where any single-column sort helps only its own column
    val data = spark.range(n).toDF("i").select(
      (hash(col("i")).cast("long").bitwiseAND(lit(1023L))).as("x"),
      (hash(col("i"), lit(1)).cast("long").bitwiseAND(lit(1023L))).as("y"))
    val root = Files.createTempDirectory("graft_zorder")
    val zPath = s"$root/z"
    val rrPath = s"$root/rr"
    ZOrder.writeZOrdered(data, col("x"), col("y"), zPath, numFiles = 16)
    data.repartition(16).write.mode("overwrite").parquet(rrPath)

    def box(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("x") < 64 && col("y") < 64)

    // the box is (1/16)² = 0.4% of the space; selectivity must agree
    val zSel = box(zPath)
    val rrSel = box(rrPath)
    assert(zSel.count() == rrSel.count())
    val zRead = rowsRead(zSel)
    val rrRead = rowsRead(rrSel)
    // the scan must push both bounds for stats to apply at all
    val scan = zSel.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head.toString
    assert(scan.contains("LessThan(x,64)") && scan.contains("LessThan(y,64)"),
      scan.take(2000))
    // round-robin: every file spans the full (x, y) domain → no skip
    assert(rrRead >= (n * 9) / 10, s"rr read $rrRead of $n")
    // z-layout: files/row-groups cover disjoint z-ranges → tight boxes
    assert(zRead <= n / 4, s"z read $zRead of $n (rr read $rrRead)")
  }

  test("bloom-filtered layout prunes a point lookup min/max stats cannot") {
    val n = 200000L
    // high-cardinality key in RANDOM order: every row group spans
    // ~the full key domain, so min/max stats never exclude anything —
    // the exact case bloom filters exist for
    val data = spark.range(n).toDF("i").select(
      (hash(col("i")).cast("long").bitwiseAND(lit(0x7FFFFFFFL))).as("key"),
      col("i").as("payload"))
    val root = Files.createTempDirectory("graft_bloom")
    val bPath = s"$root/bloom"
    val pPath = s"$root/plain"
    ZOrder.writeWithBloom(data, Seq("key"), bPath, numFiles = 16,
      ndv = 20000L)
    data.repartition(16).write.mode("overwrite").parquet(pPath)
    val probe = data.filter(col("payload") === 12345L)
      .select("key").head().getLong(0)

    def look(path: String): DataFrame =
      spark.read.parquet(path).filter(col("key") === probe)
    assert(look(bPath).count() == look(pPath).count())
    val bRead = rowsRead(look(bPath))
    val pRead = rowsRead(look(pPath))
    // plain layout: all 16 row groups match on min/max → full read
    assert(pRead >= (n * 9) / 10, s"plain read $pRead of $n")
    // bloom layout: only the (few) groups that might hold the key
    assert(bRead <= n / 4, s"bloom read $bRead of $n (plain $pRead)")
  }
}
