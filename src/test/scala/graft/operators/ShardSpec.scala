package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Shard (deterministic corpus shuffle): permutation integrity,
  * partitioning-invariance, growth-stable relative order, balance, the
  * single-exchange plan shape, and the sharded writer round-trip. */
class ShardSpec extends SparkSpecBase {

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id")

  test("assign: bijection — every id exactly once, per-shard positions " +
    "contiguous from 1") {
    val a = Shard.assign(docs, col("doc_id"), 8).cache()
    val n = docs.count()
    assert(a.count() == n)
    assert(a.select("doc_id").distinct().count() == n)
    // positions are exactly 1..count(shard) within each shard
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("shard_pos").as("lo"),
        max("shard_pos").as("hi"),
        countDistinct("shard_pos").as("nd"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("nd") =!= col("n"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
    a.unpersist()
  }

  test("assign: identical output under different input partitionings " +
    "and re-runs") {
    val one = Shard.assign(docs.coalesce(1), col("doc_id"), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val many = Shard.assign(docs.repartition(7), col("doc_id"), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one == many)
  }

  test("assign: relative replay order is stable under corpus filtering") {
    val full = Shard.assign(docs, col("doc_id"), 8)
      .select(col("doc_id"), col("shard"), col("shard_pos").as("full_pos"))
    val sub = Shard.assign(docs.filter(col("doc_id") % 3 === 0),
      col("doc_id"), 8)
      .select(col("doc_id"), col("shard_pos").as("sub_pos"))
    // within each shard, the subset's order must be the full order
    // restricted to surviving ids: sub_pos ascending <=> full_pos
    // ascending (rank of full_pos among survivors == sub_pos)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("full_pos")
    val diverged = full.join(sub, "doc_id")
      .withColumn("expect", row_number().over(w).cast("long"))
      .filter(col("expect") =!= col("sub_pos"))
    assert(diverged.isEmpty, diverged.collect().take(5).mkString(", "))
  }

  test("assign: shards are balanced on a uniform id range") {
    val ids = spark.range(20000).toDF("doc_id")
    val sizes = Shard.assign(ids, col("doc_id"), 8)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8)
    assert(sizes.max <= sizes.min * 1.1,
      s"skewed shards: ${sizes.toSeq.sorted}")
  }

  test("assign: null ids are excluded; plan is one hash exchange, " +
    "never a global window") {
    val withNull = docs.unionByName(
      spark.sql("SELECT CAST(NULL AS BIGINT) AS doc_id"))
    val a = Shard.assign(withNull, col("doc_id"), 8)
    assert(a.count() == docs.count())
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("assign: epochs are independent permutations over the same row " +
    "set (epoch 0 = the pinned default)") {
    val e0 = Shard.assign(docs, col("doc_id"), 8)
    val e0b = Shard.assign(docs, col("doc_id"), 8, epoch = 0)
    val e1 = Shard.assign(docs, col("doc_id"), 8, epoch = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows(e0) == rows(e0b))
    val r0 = rows(e0); val r1 = rows(e1)
    // same ids, same per-shard position law...
    assert(r0.map(_._1) == r1.map(_._1))
    assert(r0.groupBy(_._2).view.mapValues(_.size).toMap.values.sum ==
      r1.groupBy(_._2).view.mapValues(_.size).toMap.values.sum)
    // ...but a genuinely different permutation
    assert(r0 != r1, "epoch 1 must re-key the permutation")
    val p1 = r1.map(t => t._1 -> ((t._2, t._3))).toMap
    val moved = r0.count(t => p1(t._1) != ((t._2, t._3)))
    assert(moved > docs.count() / 2, s"only $moved rows moved across epochs")
  }

  test("sqlShard: DuckDB evaluation matches shardOf for epoch 0 AND " +
    "epoch > 0 (an epoch-2 oracle checks the epoch-2 cut, not epoch 0)") {
    import spark.implicits._
    for (epoch <- Seq(0, 2)) {
      val mine = Shard.assign(spark.range(0, 1000).toDF("doc_id"),
          col("doc_id"), 8, epoch)
        .select("doc_id", "shard")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      graft.sources.DuckGate.withDuck {
        val con = java.sql.DriverManager.getConnection("jdbc:duckdb:")
        try {
          val rs = con.createStatement().executeQuery(
            s"SELECT i, ${Shard.sqlShard("i", 8, epoch)} FROM range(0, 1000) t(i)")
          val duck = Iterator.continually(rs)
            .takeWhile(_.next()).map(r => r.getLong(1) -> r.getInt(2)).toMap
          assert(duck == mine, s"epoch $epoch: engines disagree on " +
            s"${mine.keys.filter(k => mine(k) != duck(k)).take(5)}")
        } finally con.close()
      }
    }
    // and the two epochs are genuinely different assignments
    val s0 = Shard.sqlShard("i", 8)
    val s2 = Shard.sqlShard("i", 8, epoch = 2)
    assert(s0 != s2 && s2.contains(":shard:2"), s2)
  }

  test("writeSharded: one directory per shard, read-back equals the " +
    "assignment, in-file rows in replay order") {
    val a = Shard.assign(docs, col("doc_id"), 4)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Shard.writeSharded(docs, col("doc_id"), 4, dir)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq == (0 until 4).map(i => s"shard=$i"))
    val back = spark.read.parquet(dir)
    assert(back.select(col("doc_id"), col("shard").cast("int"),
        col("shard_pos")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      a.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    // physical order inside each shard's files is the replay order
    val mono = back.select(col("shard"),
        col("shard_pos"),
        monotonically_increasing_id().as("file_order"))
      .groupBy("shard")
      .agg(max(col("file_order") - col("shard_pos")).as("hi"),
        min(col("file_order") - col("shard_pos")).as("lo"))
      .filter(col("hi") =!= col("lo"))
    assert(mono.isEmpty,
      "rows not in shard_pos order: " + mono.collect().mkString(", "))
  }
}
