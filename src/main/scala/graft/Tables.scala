package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver test tables (see /root/repo/TESTDATA.md).
  *
  * All operators in this library are written against plain DataFrames so
  * they run unchanged against any parquet/orc/csv layout; these helpers are
  * only the test-harness binding. At cluster scale the same operators read
  * partitioned directories (e.g. `.../year=2024/...`) and Catalyst's
  * partition pruning + parquet filter pushdown apply automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session DataFrame cache: re-creating a parquet DataFrame
    * re-lists files and re-reads footers — measurable constant overhead
    * when dozens of queries touch the same tables. The cached object is
    * only the analyzed plan (no data); invalidate by new session. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(spark), s"$sfDir/$table.parquet"),
      key => spark.read.parquet(key._2))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical form the lake wrote:
    * parquet TIMESTAMP(NANOS) (which Spark 4 maps to LONG nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by our session
    * builders) or a naive `timestamp[us]` (which Spark 4 infers as
    * TIMESTAMP_NTZ). Normalize both to a session-zoned TimestampType
    * column so every downstream `unix_micros`/window expression sees one
    * type. The ns branch uses integer division (`div`, NOT `/` — double
    * division loses precision above 2^53, and ns epochs are ~1.7e18);
    * the NTZ branch is a cast, deterministic because every session in
    * this library pins `spark.sql.session.timeZone=UTC`.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(load(s, d, "events"))

  /** The ts normalization above, shared with the streaming queries
    * (same expression on both sides, so the streamed result and its
    * batch oracle can never diverge on timestamp handling). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
