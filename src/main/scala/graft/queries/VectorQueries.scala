package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.operators._

/** Embedding similarity + scalable-dedup + multimodal surface
  * (SURVEY §7.6). MinHash/SimHash/LSH queries use engine-specific
  * hashing (xxhash64) so they carry no SQL oracle — the driver records a
  * rows-only check; their semantics are pinned by ScalaTest instead.
  */
object VectorQueries extends QueryGroup {

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("vec"))

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"),
        Similarity.asDouble(col("embedding")).as("qvec"))

  def simTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(queriesDf(spark, dir), corpus(spark, dir), 5)

  /** Production near-dup: exact cluster-blocked pairs (triangle-
    * inequality pruning, shuffle joins only — no O(n²) broadcast plan).
    * Bit-equal to the brute-force oracle by construction. */
  def nearDupCosine(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairsBlocked(corpus(spark, dir), 0.3, k = 8)

  /** Brute-force cross-check of the same answer (kept under the oracle
    * so the exact baseline stays driver-verified too). */
  def nearDupCosineExact(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(corpus(spark, dir), 0.3)

  def lshAnn(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshBucketTopK(queriesDf(spark, dir), corpus(spark, dir), 5)

  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    // one k-means refinement pass: exercises the full train→assign→probe
    // path under the driver (recall quality itself is pinned by IvfSpec)
    val centroids = Ivf.train(c, k = 8, iters = 1)
    Ivf.searchTopK(queriesDf(spark, dir), Ivf.assign(c, centroids),
      centroids, k = 5, nprobe = 2)
  }

  /** Signature emitted as `sig_str` (underscore-joined) — the driver's
    * pandas comparator sorts output columns, and a raw array column is
    * unhashable there; the string form keeps the row verifiable. */
  def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(Tables.documents(spark, dir), "doc_id",
      col("text"))
      .select(col("doc_id"), col("n_shingles"),
        concat_ws("_", col("sig")).as("sig_str"))

  def lshCandidates(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshCandidates(
      Dedup.minhashSignatures(Tables.documents(spark, dir), "doc_id",
        col("text")), "doc_id")

  def simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash64(Tables.documents(spark, dir), "doc_id", col("text"))

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("media", col("text").cast("binary"))
      .select(col("doc_id"),
        length(col("media")).cast("long").as("byte_len"),
        sha2(col("media"), 256).as("sha"),
        (pmod(length(col("media")), lit(640)) + 1).cast("int").as("fake_width"),
        (pmod(length(col("media")).cast("long") * 31, lit(480)) + 1)
          .cast("int").as("fake_height"),
        (expr("length(media) div 100") + 1).cast("int").as("est_frames"))

  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      multimodalMeta(spark, dir).withColumnRenamed("doc_id", "media_id")
        .withColumn("n_frames", col("est_frames")),
      step = 5)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> (simTopK _),
    "near_dup_cosine" -> (nearDupCosine _),
    "near_dup_cosine_exact" -> (nearDupCosineExact _),
    "lsh_ann" -> (lshAnn _),
    "ivf_ann" -> (ivfAnn _),
    "minhash_signatures" -> (minhashSigs _),
    "minhash_lsh_candidates" -> (lshCandidates _),
    "simhash" -> (simhash _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_frames" -> (multimodalFrames _))

  /** One oracle, two plans: blocked and brute force must both equal it. */
  private val nearDupOracle =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.3""".stripMargin

  def oracles: Map[String, String] = Map(
    "sim_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT q.vec_id AS qid, c.vec_id AS id,
        |  list_dot_product(q.v, c.v) /
        |    (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 8 AND q.vec_id != c.vec_id)
        |SELECT qid, id, cosine, CAST(rank AS INT) AS rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY cosine DESC, id) AS rank FROM s) t
        |WHERE rank <= 5""".stripMargin,
    "near_dup_cosine" -> nearDupOracle,
    "near_dup_cosine_exact" -> nearDupOracle,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
        |  sha256(text) AS sha,
        |  CAST(octet_length(text::BLOB) % 640 + 1 AS INT) AS fake_width,
        |  CAST((octet_length(text::BLOB) * 31) % 480 + 1 AS INT) AS fake_height,
        |  CAST(octet_length(text::BLOB) // 100 + 1 AS INT) AS est_frames
        |FROM documents""".stripMargin,
    "multimodal_frames" ->
      """SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx
        |FROM (SELECT doc_id,
        |  unnest(range(0, octet_length(text::BLOB) // 100 + 1, 5)) AS frame_idx
        |FROM documents) t""".stripMargin)
}
