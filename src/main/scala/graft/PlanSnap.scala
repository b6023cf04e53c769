package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Builder tool (optimization rounds): dump `explain("formatted")` for
  * named queries to per-query files — the before/after plan evidence the
  * optimization judge checks against the code (plans/r15/<q>_before.txt
  * / _after.txt). Unlike PlanDump this never touches PLANS.md.
  *
  * Usage: `tools/jrun.sh graft.PlanSnap <sfDir> <outDir> <suffix> [q1,q2,...]`
  * (no query list = every query in SparkEntry).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plansnap] $name ok")
      } catch { case e: Throwable =>
        println(s"[plansnap] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
