package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioned dataset sinks (SURVEY §4: the reference's year/day
  * directory layout + filename globs are its partition pruning —
  * /root/reference/pipelines/prism/download-ts-ppt-day.yml:21-22 stages
  * per-year trees; stage-ts-ppt-day-mi-rollsum-14d.yml:26-27 filters by
  * filename glob).
  *
  * In the engine that becomes `partitionBy` directory layout, and
  * Catalyst's `PruneFileSourcePartitions` turns day/year predicates into
  * scans that never touch the other partitions — the difference between
  * reading 100 TB and reading one day of it.
  */
object Sink {
  /** Write with a derived `day` (and optionally `year`) partition column.
    * Rule of thumb at scale: partition by the coarsest column queries
    * filter on; aim for >=100 MB files per partition (tune upstream
    * repartition), and NEVER partition by a high-cardinality key. */
  def writeDayPartitioned(df: DataFrame, ts: Column, path: String,
                          alsoYear: Boolean = false): Unit = {
    val withDay = df.withColumn("day", to_date(ts))
    val (out, cols) =
      if (alsoYear) (withDay.withColumn("year", year(col("day"))),
        Seq("year", "day"))
      else (withDay, Seq("day"))
    out.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
  }

  /** Incremental backfill: overwrite ONLY the partitions present in
    * `slice` (dynamic partition-overwrite), leaving every other
    * partition's files untouched — the engine-native form of the
    * reference's per-day skip-if-exists re-runs
    * (pipelines/prism/county_daily_aggregate_child.yml: one day per
    * step). Re-running one bad day rewrites one directory, not 100 TB.
    */
  def overwritePartitions(slice: DataFrame, partitionCols: Seq[String],
                          path: String): Unit =
    // per-write option, NOT a session-conf flip: mutating the session
    // setting would race with concurrent writers sharing the session
    // (an unrelated overwrite could silently turn dynamic)
    slice.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet dataset into ~`targetMB`
    * files. Streaming appends, per-day backfills and wide shuffles leave
    * thousands of KB-sized files; at 100 TB the file COUNT (listing,
    * footer reads, task scheduling) becomes the bottleneck before the
    * bytes do.
    *
    * Pass `partitionCols` for a partitioned dataset — the rewrite then
    * repartitions BY those columns and re-writes `partitionBy`, so the
    * directory layout (and partition pruning) survives; omitting them on
    * a partitioned dataset would flatten it.
    *
    * Swap order keeps the data reachable at every instant: write tmp →
    * move original aside → move tmp in → delete the old copy. A crash
    * leaves either the original or the fully-written replacement in
    * place (plus a leftover dir to GC), never a missing dataset.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetMB: Int = 128,
              partitionCols: Seq[String] = Nil): Long = {
    import org.apache.hadoop.fs.Path
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val targetBytes = targetMB.toLong * 1024 * 1024
    val nFiles = math.max(1L,
      bytes / targetBytes + (if (bytes % targetBytes == 0) 0 else 1))
    val tmp = new Path(path.stripSuffix("/") + "__compact_tmp")
    val old = new Path(path.stripSuffix("/") + "__compact_old")
    val df = spark.read.parquet(path)
    val writer =
      if (partitionCols.nonEmpty)
        df.repartition(nFiles.toInt, partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
      else df.repartition(nFiles.toInt).write
    writer.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(hadoopPath, old), s"compact: cannot move $path aside")
    require(fs.rename(tmp, hadoopPath), s"compact: cannot move $tmp into place")
    fs.delete(old, true)
    nFiles
  }

  /** Keyed MERGE (upsert) into a parquet dataset: rows in `updates`
    * replace same-key rows in the dataset, new keys append — the
    * distributed analog of the reference's `catalog_json_upsert` keyed
    * merge, at data scale instead of driver-side JSON.
    *
    * Parquet has no row-level transactions, so the merge is a rewrite:
    * anti-join the existing data against the update keys (one shuffle —
    * or a broadcast when the update set is small), union the updates,
    * swap directories via the same always-reachable rename dance as
    * [[compact]]. Cost is proportional to the dataset, which is why at
    * 100 TB you merge per PARTITION: pass `partitionCols` and only the
    * partitions containing updated keys are rewritten (the rest are
    * untouched directories).
    */
  def mergeInto(spark: org.apache.spark.sql.SparkSession, path: String,
                updates: DataFrame, keys: Seq[String],
                partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val existing = spark.read.parquet(path)
    val kept = existing.join(
      updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val merged = kept.unionByName(updates.select(existing.columns.map(col): _*))
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.stripSuffix("/") + "__merge_tmp")
    val old = new Path(path.stripSuffix("/") + "__merge_old")
    val writer =
      if (partitionCols.nonEmpty) merged.write.partitionBy(partitionCols: _*)
      else merged.write
    writer.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(hadoopPath, old), s"mergeInto: cannot move $path aside")
    require(fs.rename(tmp, hadoopPath), s"mergeInto: cannot move $tmp in")
    fs.delete(old, true)
  }

  /** Bucketed managed table: co-locates join/aggregation keys at WRITE
    * time so repeated joins on `keys` between same-bucketed tables run
    * with NO shuffle exchange — the cheapest join at 100 TB when the
    * join key is known upfront (SURVEY §4: the reference re-partitions
    * by writing files into differently-keyed directories; bucketing is
    * the engine-native form). Bucket count rule: total size / bucket ≈
    * 100-500 MB at the target scale.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
