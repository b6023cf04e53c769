package graft

import org.apache.spark.sql.SparkSession

/** Builder tool (optimization rounds): time one or more queries
  * several times in ONE JVM/session, printing each repetition — the
  * steady-state per-query latency that fresh-JVM bench windows blur
  * with JIT/classload noise. Methodology matches Bench: noop sink,
  * same session configs, SPARK_GRAFT_CPUS cores.
  *
  * Usage: `tools/jrun.sh graft.SoloTime <sfDir> <q1,q2,...> [reps]`
  */
object SoloTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", BenchEnv.aqeEnabled.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[solotime] $name rep$i $t%.3f s")
        t
      }
      println(f"[solotime] $name min=${ts.min}%.3f median=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
