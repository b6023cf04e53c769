package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** CountMin sketch contracts: overcount-only estimates, mergeability
  * (partials summed ≡ one-shot build), partitioning-independence. */
class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  // skewed token stream across two "days": `hot` appears 35× total
  // (30 in d1 + 5 in d2 — the cross-partial case), others once or 5×
  private lazy val tokens = {
    val rows = (1 to 30).map(_ => ("d1", "hot")) ++
      (1 to 5).map(i => ("d1", s"warm$i")) ++
      (1 to 5).map(_ => ("d2", "hot")) ++
      Seq(("d2", "cold"))
    rows.toDF("day", "w")
  }

  test("estimate never undercounts, and is exact when no bucket collides") {
    val sketch = CountMin.merge(
      CountMin.partials(tokens, col("day"), col("w")))
    val exact = tokens.groupBy(col("w").as("token"))
      .agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(sketch, exact, col("token"))
      .join(exact, Seq("token")).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_n"),
        s"undercount for ${r.getString(0)}")
    }
    // 7 distinct tokens into 256 buckets × 4 rows: collisions in ALL
    // four rows are practically impossible — min must be exact here
    est.foreach { r =>
      assert(r.getAs[Long]("cms_est") == r.getAs[Long]("exact_n"),
        s"unexpected collision for ${r.getString(0)}")
    }
  }

  test("querying a token the sketch never saw estimates 0 (sparse grid, left join)") {
    import spark.implicits._
    val sketch = CountMin.merge(
      CountMin.partials(tokens, col("day"), col("w")))
    // 7 distinct tokens × 4 rows touch ≤28 of 1024 counters: an unseen
    // token collides with populated counters in ALL FOUR rows with
    // probability ~(28/256)^4 ≈ 1e-4 — an inner join would instead
    // DROP the token or min over the few populated rows it hits
    val est = CountMin.estimate(sketch,
      Seq("never-seen-token").toDF("token"), col("token")).collect()
    assert(est.length == 1, "unseen token must still get an estimate row")
    assert(est.head.getAs[Long]("cms_est") == 0L)
  }

  test("merging per-day partials equals building one sketch over the union") {
    val merged = CountMin.merge(
      CountMin.partials(tokens, col("day"), col("w")))
    val oneShot = CountMin.merge(
      CountMin.partials(tokens, lit("all"), col("w")))
    assert(merged.except(oneShot).isEmpty &&
      oneShot.except(merged).isEmpty)
  }

  test("counters are partitioning-independent") {
    val a = CountMin.merge(
        CountMin.partials(tokens, col("day"), col("w")))
      .orderBy("h", "b").collect().toSeq
    val b = CountMin.merge(
        CountMin.partials(tokens.repartition(13), col("day"), col("w")))
      .orderBy("h", "b").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
