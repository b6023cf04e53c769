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
    * Crash contract: see [[swapInto]] (recoverable, self-healing on the
    * next call; parquet directories cannot be swapped atomically).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetMB: Int = 128,
              partitionCols: Seq[String] = Nil): Long = {
    import org.apache.hadoop.fs.Path
    recoverCrashedSwap(spark, path)
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val targetBytes = targetMB.toLong * 1024 * 1024
    val nFiles = math.max(1L,
      bytes / targetBytes + (if (bytes % targetBytes == 0) 0 else 1))
    val df = spark.read.parquet(path)
    swapInto(spark, path, "compact") { tmp =>
      val writer =
        if (partitionCols.nonEmpty)
          df.repartition(nFiles.toInt, partitionCols.map(col): _*)
            .write.partitionBy(partitionCols: _*)
        else df.repartition(nFiles.toInt).write
      writer.mode("overwrite").parquet(tmp)
    }
    nFiles
  }

  /** Keyed MERGE (upsert) into a parquet dataset: rows in `updates`
    * replace same-key rows in the dataset, new keys append — the
    * distributed analog of the reference's `catalog_json_upsert` keyed
    * merge, at data scale instead of driver-side JSON.
    *
    * `updates` must be UNIQUE per key; a changelog carrying several
    * changes to one key must say which wins — pass `precedence`
    * (descending-priority ordering columns) for last-write-wins, or the
    * merge fails in-flight instead of silently writing duplicate keys
    * (the guard is a window count INSIDE the rewrite plan — no separate
    * pre-pass job over the changelog).
    *
    * Unpartitioned: rewrite + directory swap (see [[swapInto]] for the
    * crash contract). Partitioned: `partitionCols` makes the merge
    * PARTITION-SCOPED — only partitions that contain updated keys (new
    * OR old row) are rewritten, via dynamic partition-overwrite; the
    * other directories are never touched (the 100 TB path: a
    * one-partition update rewrites one partition). An update that MOVES
    * a key to a different partition value removes the key's old row too
    * (its old partition is rewritten, and deleted outright if emptied);
    * finding those old rows costs one key-column scan of the dataset —
    * pass `stablePartitions = true` to skip it when partition values
    * are immutable per key (then only the updates' own partitions are
    * rewritten).
    */
  /** Targeted deletion — the right-to-be-forgotten pass: remove every
    * row matching `deleteKeysIn` (on `keys`), rewriting ONLY the
    * partitions that hold a matching row (one key-column scan finds
    * them; everything else is untouched bytes, the property the GDPR
    * audit checks). Partitions emptied by the deletion are removed
    * outright. Without `partitionCols`, the whole dataset is rewritten
    * via the crash-safe swap (same as unpartitioned mergeInto).
    */
  def deleteKeys(spark: org.apache.spark.sql.SparkSession, path: String,
                 deleteKeysIn: DataFrame, keys: Seq[String],
                 partitionCols: Seq[String] = Nil,
                 checkpointDir: Option[String] = None): Unit = {
    recoverCrashedSwap(spark, path)
    val existing = spark.read.parquet(path)
    val delKeys = deleteKeysIn.select(keys.map(col): _*).distinct()
    if (partitionCols.nonEmpty) {
      val pcols = partitionCols.map(col)
      // partitions holding a doomed row — the only ones rewritten;
      // LocalRelation-materialized so the semi join broadcasts a
      // constant (bounded by the deletion's partition spread)
      val touchedPlan = existing.join(delKeys, keys, "left_semi")
        .select(pcols: _*).distinct()
      val touched = {
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(
          touchedPlan.collect().toSeq.asJava, touchedPlan.schema)
      }
      if (touched.isEmpty) return // nothing matches: zero rewrites
      val keptCond = partitionCols
        .map(c => existing(c) <=> touched(c)).reduce(_ && _)
      val slice = materializeSlice(existing
        .join(broadcast(touched), keptCond, "left_semi")
        .join(delKeys, keys, "left_anti"), checkpointDir)
      overwritePartitions(slice, partitionCols, path)
      deleteEmptiedPartitions(spark, path, partitionCols, touched, slice)
    } else {
      val kept = existing.join(delKeys, keys, "left_anti")
      swapInto(spark, path, "merge")(tmp =>
        kept.write.mode("overwrite").parquet(tmp))
    }
  }

  /** Materialize the rewrite slice before the overwrite. Local
    * checkpoint is the local-mode default; with executor loss or
    * dynamic allocation its blocks can vanish mid-write, so a cluster
    * caller passes `checkpointDir` for a reliable checkpoint instead —
    * the same contract as [[Components]]/[[KCore]]. */
  private def materializeSlice(df: DataFrame,
                               checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(d) =>
        df.sparkSession.sparkContext.setCheckpointDir(d)
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }

  def mergeInto(spark: org.apache.spark.sql.SparkSession, path: String,
                updatesIn: DataFrame, keys: Seq[String],
                partitionCols: Seq[String] = Nil,
                precedence: Seq[Column] = Nil,
                stablePartitions: Boolean = false,
                checkpointDir: Option[String] = None): Unit = {
    recoverCrashedSwap(spark, path) // BEFORE reading: path may be mid-swap
    val existing = spark.read.parquet(path)
    import org.apache.spark.sql.expressions.Window
    val updates = {
      val aligned = updatesIn.select(existing.columns.map(col): _*)
      if (precedence.nonEmpty) {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(precedence.map(_.desc): _*)
        aligned.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      } else {
        // duplicate-key guard folded INTO the plan: a per-key window
        // count raises mid-write on the first duplicate — at scale the
        // old separate count() pre-pass was a full extra job over the
        // changelog before any work. The guard rides the first key
        // column (coalesce of an always-null assert) so column pruning
        // cannot drop it.
        val w = Window.partitionBy(keys.map(col): _*)
        val guard = assert_true(count(lit(1)).over(w) <= 1,
          lit(s"mergeInto: updates carry duplicate keys " +
            s"${keys.mkString(",")}; pass `precedence` to pick a winner"))
        aligned.withColumn(keys.head, coalesce(guard, col(keys.head)))
      }
    }
    val updateKeys = updates.select(keys.map(col): _*).distinct()
    if (partitionCols.nonEmpty) {
      val pcols = partitionCols.map(col)
      // partitions to rewrite: those receiving update rows PLUS those
      // holding an updated key's OLD row (skipped under
      // `stablePartitions`) — without the latter, an update that moves
      // a key across partitions would leave the old copy in place: a
      // silent duplicate key. Materialized to a LocalRelation (one
      // job, bounded by the update's partition spread) so the semi
      // join below broadcasts a constant instead of re-running this.
      val touchedPlan =
        if (stablePartitions) updates.select(pcols: _*).distinct()
        else updates.select(pcols: _*)
          .union(existing.join(updateKeys, keys, "left_semi")
            .select(pcols: _*))
          .distinct()
      val touched = {
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(
          touchedPlan.collect().toSeq.asJava, touchedPlan.schema)
      }
      // NULL-SAFE semi join: a null partition value (the Hive default
      // partition) must still match its touched entry — a plain equi
      // join would drop every null-partition row from `kept`, and the
      // emptied-partition sweep below would then delete the whole
      // default-partition directory including untouched keys
      val keptCond = partitionCols
        .map(c => existing(c) <=> touched(c)).reduce(_ && _)
      val kept = existing
        .join(broadcast(touched), keptCond, "left_semi")
        .join(updateKeys, keys, "left_anti")
      // eager checkpoint: the merged slice must be MATERIALIZED before
      // the overwrite — Spark (rightly) refuses to overwrite a path its
      // own plan is still reading, and the slice is only the touched
      // partitions, so the footprint is bounded by the update's spread
      val slice = materializeSlice(kept.unionByName(updates), checkpointDir)
      overwritePartitions(slice, partitionCols, path)
      // dynamic overwrite only rewrites partitions PRESENT in the
      // output — a touched partition whose every row was an updated
      // key that moved away produces no rows and would survive as a
      // stale directory; drop those explicitly
      if (!stablePartitions)
        deleteEmptiedPartitions(spark, path, partitionCols, touched, slice)
    } else {
      val merged = existing.join(updateKeys, keys, "left_anti")
        .unionByName(updates)
      swapInto(spark, path, "merge")(tmp =>
        merged.write.mode("overwrite").parquet(tmp))
    }
  }

  /** Delete partition directories in `touched` that have no rows left in
    * `slice` (both are small: touched partitions only). Directory names
    * use the same Hive-style escaping the parquet writer uses. */
  private def deleteEmptiedPartitions(
      spark: org.apache.spark.sql.SparkSession, path: String,
      partitionCols: Seq[String], touched: DataFrame,
      slice: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    def valueStrings(df: DataFrame): Set[Seq[Option[String]]] =
      df.select(partitionCols.map(c => col(c).cast("string")): _*)
        .distinct().collect()
        .map(r => partitionCols.indices
          .map(i => Option(r.getString(i))).toSeq)
        .toSet
    val emptied = valueStrings(touched) -- valueStrings(slice)
    if (emptied.nonEmpty) {
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { values =>
        val rel = partitionCols.zip(values).map { case (c, v) =>
          // null/empty values map to the Hive default-partition name
          // inside getPartitionPathString
          ExternalCatalogUtils.getPartitionPathString(c, v.orNull)
        }.mkString("/")
        fs.delete(new Path(path.stripSuffix("/") + "/" + rel), true)
      }
    }
  }

  /** Restore a dataset left mid-swap by a crashed [[swapInto]] (of any
    * op) and clear stale tmp/old leftovers — called at the START of
    * every swap-based operation, before the dataset is read. */
  private def recoverCrashedSwap(spark: org.apache.spark.sql.SparkSession,
                                 path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("merge", "compact").foreach { op =>
      val tmp = new Path(path.stripSuffix("/") + s"__${op}_tmp")
      val old = new Path(path.stripSuffix("/") + s"__${op}_old")
      // crash between the renames: the data sits in `old`
      if (!fs.exists(target) && fs.exists(old))
        require(fs.rename(old, target), s"$op: recovery rename failed")
      if (fs.exists(tmp)) fs.delete(tmp, true) // stale partial write
      if (fs.exists(old)) fs.delete(old, true) // stale post-swap leftover
    }
  }

  /** Write-then-swap with crash RECOVERY, not crash immunity: parquet
    * directories cannot be replaced atomically, so there is an instant
    * between the two renames where `path` is absent. What this does
    * guarantee: (a) a crash at any point leaves the data recoverable,
    * and (b) the NEXT swap-based call self-heals via
    * [[recoverCrashedSwap]] rather than being blocked by leftovers. */
  private def swapInto(spark: org.apache.spark.sql.SparkSession,
                       path: String, op: String)(write: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.stripSuffix("/") + s"__${op}_tmp")
    val old = new Path(path.stripSuffix("/") + s"__${op}_old")
    write(tmp.toString)
    require(fs.rename(target, old), s"$op: cannot move $path aside")
    require(fs.rename(tmp, target), s"$op: cannot move $tmp into place")
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
