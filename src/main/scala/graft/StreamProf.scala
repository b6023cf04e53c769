package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** TEMPORARY profiling listener+main (builder-side; deleted before round
  * end): runs selected streaming drains with a per-batch duration dump.
  * Registered via spark.sql.streaming.streamingQueryListeners so the
  * drains' sub-session picks it up too.
  */
class StreamProfListener extends StreamingQueryListener {
  def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    println(s"PROF started ${System.nanoTime() / 1000000}")
  def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    println(s"PROF batch=${p.batchId} rows=${p.numInputRows} " +
      s"durations=${p.durationMs}")
  }
  def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    println(s"PROF terminated ${System.nanoTime() / 1000000}")
}

object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.StreamProfListener")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.headOption.getOrElse("stream_daily_agg").split(",")
    val qs = graft.queries.StreamingQueries.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = qs(n)(spark, sfDir)
      val tMid = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROF total_$n ${(System.nanoTime() - t0) / 1e9}%.2f " +
        f"(drain+build ${(tMid - t0) / 1e9}%.2f, readback ${
          (System.nanoTime() - tMid) / 1e9}%.2f)")
    }
    spark.stop()
  }
}
