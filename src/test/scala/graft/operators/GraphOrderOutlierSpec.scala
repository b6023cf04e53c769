package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Semantics of the graph/ordering/audit trio: distributed curriculum
  * rank ([[Curriculum]]), fixed-iteration PageRank ([[PageRank]]), and
  * per-group centroid outliers ([[Outliers]]).
  */
class GraphOrderOutlierSpec extends SparkSpecBase {
  import spark.implicits._

  test("Curriculum.order equals the naive global window, ties broken by id") {
    // skewed difficulties incl. a duplicated value straddling buckets
    val rows = Seq(5L -> 10L, 1L -> 3L, 2L -> 3L, 3L -> 999L, 4L -> 0L,
      6L -> 10L, 7L -> 500L)
    val df = rows.toDF("doc_id", "diff")
    val out = Curriculum.order(df, col("doc_id"), col("diff"), buckets = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos")).toMap
    val expected = rows.sortBy { case (id, d) => (d, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(out == expected)
  }

  test("Curriculum.order with one bucket degenerates to the plain rank") {
    val df = Seq(1L -> 5L, 2L -> 4L, 3L -> 5L).toDF("doc_id", "diff")
    val out = Curriculum.order(df, col("doc_id"), col("diff"), buckets = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos")).toMap
    assert(out == Map(2L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("PageRank: symmetric triangle stays uniform; star centralizes mass") {
    // triangle: every node's rank stays 1/3 under any #iterations
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L)).toDF("src", "dst")
    val nodes3 = Seq(1L, 2L, 3L).toDF("id")
    val uniform = PageRank.run(nodes3, tri, iters = 3)
      .collect().map(_.getAs[Double]("pr"))
    // 1e-9 floor: Exact's decimal(30,10) addend cast quantizes at
    // 1e-10 per term (the documented precision trade for determinism)
    uniform.foreach(p => assert(math.abs(p - 1.0 / 3) < 1e-9))
    // undirected star 1–{2,3,4}: center accumulates leaf mass
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (4L, 1L)).toDF("src", "dst")
    val nodes4 = (1L to 4L).toDF("id")
    val pr = PageRank.run(nodes4, star, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pr")).toMap
    assert(pr(1L) > pr(2L))
    assert(math.abs(pr(2L) - pr(3L)) < 1e-15 &&
      math.abs(pr(3L) - pr(4L)) < 1e-15)
    // hand-rolled 2-iteration values: center 0.15/4+0.85*3*(pr_leaf/1)
    val p0 = 0.25
    val base = 0.15 / 4
    val l1 = base + 0.85 * (p0 / 3)   // leaf after iter 1
    val c2 = base + 0.85 * 3 * l1     // center after iter 2
    assert(math.abs(pr(1L) - c2) < 1e-9, s"center ${pr(1L)} vs $c2")
  }

  test("PageRank: isolated vertices keep base rank; dangling mass drops") {
    // 1→2 plus isolated 3: node 1 gets no in-mass, 2 gets 1's share,
    // 3 (no edges at all) keeps (1−d)/n; 2's mass then dangles away
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val pr = PageRank.run(Seq(1L, 2L, 3L).toDF("id"), e, iters = 2)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("pr")).toMap
    val base = 0.15 / 3
    assert(math.abs(pr(1L) - base) < 1e-15)
    assert(math.abs(pr(3L) - base) < 1e-15)
    assert(math.abs(pr(2L) - (base + 0.85 * base)) < 1e-9)
  }

  test("Bm25.topK: rare matching term outranks common one; length normalization bites") {
    val docs = Seq(
      (1L, "spark spark spark common common"),
      (2L, "spark common common common common common common common " +
        "common common common common common common common common"),
      (3L, "common rare"),
      (4L, "common other words here")).toDF("doc_id", "text")
    val q = Seq("spark", "rare", "common").toDF("term")
    val out = Bm25.topK(docs, "doc_id", col("text"), q, k = 10)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id"))
        -> r).toMap
    // df("rare")=1 < df("spark")=2 < df("common")=4 → idf ordering
    assert(out(("rare", 3L)).getAs[Double]("score") >
      out(("spark", 1L)).getAs[Double]("score"))
    // same term: higher tf in a shorter doc wins
    assert(out(("spark", 1L)).getAs[Double]("score") >
      out(("spark", 2L)).getAs[Double]("score"))
    assert(out(("spark", 1L)).getAs[Int]("rank") == 1)
    // equal tf: the shorter doc wins on length normalization
    assert(out(("common", 3L)).getAs[Double]("score") >
      out(("common", 4L)).getAs[Double]("score"))
    // only matching docs are ranked
    assert(!out.contains(("rare", 1L)) && !out.contains(("spark", 3L)))
  }

  test("Outliers.byGroup flags the farthest vectors per group") {
    val df = Seq(
      (1L, 0, Seq(0.0, 0.0)), (2L, 0, Seq(0.1, 0.0)),
      (3L, 0, Seq(0.0, 0.1)), (4L, 0, Seq(9.0, 9.0)), // the outlier
      (5L, 1, Seq(5.0, 5.0)), (6L, 1, Seq(5.1, 5.0)),
      (7L, 1, Seq(-5.0, 5.0))) // the outlier of group 1
      .toDF("id", "grp", "vec")
    val out = Outliers.byGroup(df, k = 1)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(4L).getAs[Boolean]("is_outlier"))
    assert(out(7L).getAs[Boolean]("is_outlier"))
    assert(Seq(1L, 2L, 3L, 5L, 6L).forall(i =>
      !out(i).getAs[Boolean]("is_outlier")))
    assert(out(4L).getAs[Int]("rank") == 1 && out(7L).getAs[Int]("rank") == 1)
    // distances are to the group's own centroid, so in-group ordering
    // follows geometry: 1 (at the centroid's corner) beats 4 by far
    assert(out(4L).getAs[Double]("sq_dist") > out(1L).getAs[Double]("sq_dist"))
  }
}
