package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the disjoint-content scaled corpora behind BASELINE.md's
  * scale-proof tables — committed so every future scale row is
  * reproducible from the repo (the r7 sf1 builders were session
  * scratch; this main replaces them).
  *
  * Method (the one documented in BASELINE.md): replicate each base
  * table R× into DISJOINT id/content spaces, because replicating
  * verbatim would be the WRONG scale-up — every doc would gain R-1
  * exact copies and pair-generating operators would grow ~R², a
  * property of the synthetic corpus, not the engine. Per table:
  *
  *  - documents: doc_id shifted per replica; every whitespace token
  *    suffixed with the replica index (disjoint doc_id AND token
  *    spaces — vocabulary and postings grow R×, per-term posting
  *    lengths stay constant, exactly how fresh corpus content scales)
  *  - lineitem: l_orderkey / l_partkey / l_suppkey shifted — R
  *    disjoint co-purchase graphs and supplier groups
  *  - events: event_id / user_id shifted — R disjoint per-user series
  *  - embeddings: vec_id shifted; a deterministic per-replica ±1 sign
  *    pattern (xxhash64(replica, element) parity) decorrelates
  *    cross-replica cosines so the near-dup graph is R disjoint
  *    copies, not an R² clique blowup
  *
  * Replica 0 is bit-identical to the base table, so the base corpus is
  * an exact sub-corpus of every scaled one. Id shifts use a stride =
  * the next power of 10 above the largest id in the table (shared
  * across that table's id columns), keeping replica membership
  * readable (`id div stride` = replica).
  *
  * Usage:
  *   sbt "runMain graft.ScaleData <baseDir> <outDir> <factor> [tables]"
  * e.g.
  *   SPARK_DRIVER_MEM=16g sbt "runMain graft.ScaleData \
  *     /root/testdata/sf0.1 /tmp/graft_sf10 100 documents,lineitem,events"
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleData <baseDir> <outDir> <factor> [tables,comma-sep]")
    val Array(baseDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val tables: Seq[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("documents", "lineitem", "events", "embeddings")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    tables.foreach { t =>
      val base = spark.read.parquet(s"$baseDir/$t.parquet")
      val scaled = scale(t, base, factor)
      // output file count tracks output size (~64-128 MB per file at
      // the SFs this builds), never one giant file
      val rows = base.count() * factor
      val outParts = math.max(4, math.min(256, (rows / 500000L).toInt + 4))
      scaled.repartition(outParts)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale] $t: ${rows} rows x$factor -> $outDir/$t.parquet ($outParts files)")
    }
    spark.stop()
  }

  /** Next power of 10 strictly above the largest id among `cols`. */
  private def stride(df: DataFrame, cols: Seq[String]): Long = {
    val maxCols = cols.map(c => max(col(c)))
    val maxId = df
      .agg(if (maxCols.size == 1) maxCols.head
           else greatest(maxCols: _*))
      .head().getLong(0)
    var s = 10L
    while (s <= maxId) s *= 10
    s
  }

  private[graft] def scale(table: String, base: DataFrame, factor: Int): DataFrame = {
    val replicated = base.withColumn("__r",
      explode(sequence(lit(0L), lit(factor - 1L))))
    def shifted(c: String, str: Long) = (col(c) + col("__r") * str).as(c)
    table match {
      case "documents" =>
        val s = stride(base, Seq("doc_id"))
        // token-suffix only for r>0: replica 0 stays bit-identical
        replicated.select(
          shifted("doc_id", s),
          when(col("__r") === 0, col("text")).otherwise(
            array_join(
              transform(split(col("text"), " "),
                t => concat(t, lit("_"), col("__r"))),
              " ")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      case "lineitem" =>
        val s = stride(base, Seq("l_orderkey", "l_partkey", "l_suppkey"))
        replicated.select(
          shifted("l_orderkey", s) +: shifted("l_partkey", s) +:
            shifted("l_suppkey", s) +:
            base.columns.filterNot(Set("l_orderkey", "l_partkey", "l_suppkey"))
              .map(col).toSeq: _*)
      case "events" =>
        val s = stride(base, Seq("event_id", "user_id"))
        replicated.select(
          shifted("event_id", s) +: shifted("user_id", s) +:
            base.columns.filterNot(Set("event_id", "user_id"))
              .map(col).toSeq: _*)
      case "embeddings" =>
        val s = stride(base, Seq("vec_id"))
        replicated.select(
          shifted("vec_id", s),
          when(col("__r") === 0, col("embedding")).otherwise(
            transform(col("embedding"),
              (x, i) => when(xxhash64(col("__r"), i) % 2 === 0, x)
                .otherwise(-x))).as("embedding"),
          col("label"))
      case other =>
        // id-less or purely dimensional tables replicate verbatim
        // (region/nation etc. are not scale-proof subjects)
        replicated.select(base.columns.map(col).toSeq: _*)
    }
  }
}
