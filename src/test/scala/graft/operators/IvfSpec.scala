package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}

class IvfSpec extends SparkSpecBase {

  private lazy val corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("vec"))
  private lazy val queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < 8)
    .select(col("vec_id").as("qid"),
      Similarity.asDouble(col("embedding")).as("qvec"))

  test("train produces k centroids of the right dimension; assignment total") {
    val centroids = Ivf.train(corpus, k = 8, iters = 2)
    assert(centroids.count() == 8)
    assert(centroids.select(size(col("centroid"))).head().getInt(0) == 64)
    val assigned = Ivf.assign(corpus, centroids)
    assert(assigned.count() == corpus.count()) // every vector assigned once
    assert(assigned.select(count_distinct(col("cluster_id"))).head()
      .getLong(0) > 1) // not degenerate
  }

  test("train enforces the driver-size k ceiling (centroids are " +
    "collected per iteration and broadcast downstream)") {
    val e = intercept[IllegalArgumentException] {
      Ivf.train(corpus, k = Ivf.MaxK + 1)
    }
    assert(e.getMessage.contains("driver-sized"), e.getMessage)
    assert(intercept[IllegalArgumentException] {
      Ivf.train(corpus, k = 0)
    }.getMessage.contains("must be in [1,"))
    // the floor of the legal range is genuinely usable
    assert(Ivf.train(corpus.limit(16), k = 1, iters = 1).count() == 1)
  }

  test("IVF search recall vs brute force is substantial and exact@nprobe=k") {
    val centroids = Ivf.train(corpus, k = 8, iters = 2)
    val assigned = Ivf.assign(corpus, centroids)
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.searchTopK(queries, assigned, centroids, 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // measured 0.925 at sf0.001/sf0.01 (iters∈{0,1,2}); pinned with a
    // small margin — a regression below this means probe routing broke
    assert(recall >= 0.85, s"recall $recall too low for nprobe=3")
    // probing ALL clusters must reproduce brute force exactly
    val full = Ivf.searchTopK(queries, assigned, centroids, 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(full == exact)
  }

  test("searchTopKSweep equals an independent searchTopK per nprobe") {
    val centroids = Ivf.train(corpus, k = 8, iters = 1)
    val assigned = Ivf.assign(corpus, centroids)
    val sweep = Ivf.searchTopKSweep(queries, assigned, centroids, k = 5,
        nprobes = Seq(1, 2, 4))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getInt(5)))
      .toSet
    val perNp = Seq(1, 2, 4).flatMap { np =>
      Ivf.searchTopK(queries, assigned, centroids, k = 5, nprobe = np)
        .collect()
        .map(r => (np, r.getLong(0), r.getLong(2), r.getInt(4)))
    }.toSet
    assert(sweep == perNp,
      s"sweep-only: ${(sweep -- perNp).take(5)}; " +
        s"perNp-only: ${(perNp -- sweep).take(5)}")
  }
}
