package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star scope, SURVEY §7.6).
  *
  * [[cosine]] is a sequential-fold dot product over array columns —
  * `aggregate(zip_with(...))` stays inside codegen (no UDF, no explode)
  * and its left-to-right summation is bit-identical to DuckDB's
  * `list_dot_product`, so brute-force results are oracle-checkable.
  *
  * [[bruteForceTopK]] is the exact baseline: |Q|×|N| fold evaluations,
  * embarrassingly parallel, no shuffle until the final per-query top-k.
  * Right answer when |Q| is small or recall must be 1.0.
  *
  * [[lshBucketTopK]] is the scale path: random-hyperplane signs bucket
  * the vectors (signed projections against deterministic pseudo-random
  * planes), the join is bucket-equi instead of cross, and each query
  * only scans its bucket — recall trades against `planes`. At 100 TB the
  * bucketed table is written partitioned by bucket so queries prune
  * partitions at scan time (an IVF layout, LSH-assigned).
  */
object Similarity {

  /** Arrays must be double (cast float embeddings with [[asDouble]]). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  def asDouble(arr: Column): Column = transform(arr, x => x.cast("double"))

  /** Exact top-k neighbours for each query vector.
    * @param queries (qid, qvec double-array); @param corpus (id, vec). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = queries.crossJoin(corpus)
      .filter(col("qid") =!= col("id"))
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** All pairs with cosine >= tau (embedding near-dup detection).
    * Brute force at test scale; at cluster scale feed LSH buckets in. */
  def nearDupPairs(vecs: DataFrame, tau: Double): DataFrame = {
    val a = vecs.select(col("id").as("id_a"), col("vec").as("va"))
    val b = vecs.select(col("id").as("id_b"), col("vec").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= tau)
      .select("id_a", "id_b", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed-coefficient integer mix mapped into [-1, 1). Seed-free so
    * buckets are stable across runs and engines. */
  private def planeComponent(plane: Int, dim: Column): Column = {
    val mixed = pmod(
      (dim + lit(plane.toLong * 7919L + 13L)) * lit(2654435761L),
      lit(104729L))
    (mixed / lit(104729.0)) * lit(2.0) - lit(1.0)
  }

  /** Sign-bucket of a vector against `planes` hyperplanes. */
  def lshBucket(vec: Column, planes: Int): Column =
    Seq.tabulate(planes) { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1), p)).otherwise(0)
    }.reduce(_ + _)

  /** ANN top-k: queries only scan their own sign bucket. */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    planes: Int = 4): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col("qvec"), planes))
    val cb = corpus.withColumn("bucket", lshBucket(col("vec"), planes))
    val scored = qb.join(cb, Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .withColumn("cosine", cosine(col("qvec"), col("vec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "bucket", "id", "cosine", "rank")
  }
}
