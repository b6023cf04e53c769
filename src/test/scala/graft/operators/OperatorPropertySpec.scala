package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/** ScalaCheck properties over the Spark operators (SURVEY §5 item 2):
  * algebraic identities that must hold for ANY data, complementing the
  * oracle battery's fixed-corpus bit-exactness. Iteration counts are
  * small (each case is a Spark job); generators keep data tiny.
  */
class OperatorPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // (entity, epoch-day, value) with (entity, day) unique — a range
  // frame includes PEERS, so duplicate days would break the width-1
  // identity by design, not by bug. Values carry 2 decimals so the
  // operator's decimal(20,6) sum represents them exactly.
  private val series: Gen[List[(Int, Int, Double)]] = Gen
    .nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 40),
      Gen.choose(-10000, 10000).map(_ / 100.0)))
    .map(_.groupBy(t => (t._1, t._2)).map(_._2.head).toList)

  test("prop: rollsum with window=1 is the identity (W1 degenerate case)") {
    check(Prop.forAll(series) { rows =>
      val df = rows.toDF("cell", "off", "v")
        .withColumn("day", date_add(lit("2020-01-01"), col("off")))
      val out = Rolling.trailingDaySums(df, Seq("cell"), col("day"),
        col("v").cast("decimal(20,6)"), windows = Seq(1))
      out.select(col("v"), col("rollsum_1d")).collect()
        .forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }, n = 5)
  }

  test("prop: weighted aggregate with w≡1 equals the plain mean (A2)") {
    check(Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 2), Gen.choose(-1e6, 1e6)))) { rows =>
      val df = rows.toDF("zone", "v")
      val got = WeightedZonal(df, Seq("zone"), col("v"), lit(1.0))
        .select(col("zone"), col("wavg")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val want = rows.groupBy(_._1).map { case (z, vs) =>
        // the operator's own arithmetic: exact decimal sum, ONE division
        z -> (vs.map(t => BigDecimal(t._2)).sum.toDouble / vs.length)
      }
      want.forall { case (z, m) =>
        math.abs(got(z) - m) <= math.max(1e-12, math.abs(m) * 1e-12)
      }
    }, n = 5)
  }

  test("prop: stratified sample at rate 0 keeps nothing; membership is " +
    "a pure function of id") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 100000L))) { ids =>
      val df = ids.distinct.toDF("id").withColumn("st", lit("x"))
      val none = Sample.stratified(df, col("id"), col("st"),
        Map.empty, defaultRate = 0.0).filter(col("sampled")).count()
      val a = Sample.stratified(df, col("id"), col("st"),
        Map.empty, defaultRate = 0.37)
        .filter(col("sampled")).select("id").collect().map(_.getLong(0))
      val b = Sample.stratified(df.repartition(5), col("id"), col("st"),
        Map.empty, defaultRate = 0.37)
        .filter(col("sampled")).select("id").collect().map(_.getLong(0))
      none == 0L && a.sorted.toSeq == b.sorted.toSeq
    }, n = 5)
  }

  test("prop: Curriculum.order is a 1..n bijection equal to the naive rank, " +
    "for any bucket count") {
    val rows = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 500L),
      Gen.choose(-1000L, 1000L)))
      .map(_.groupBy(_._1).map(_._2.head).toList) // unique ids
    check(Prop.forAll(rows, Gen.choose(1, 9)) { (data, buckets) =>
      val df = data.toDF("doc_id", "diff")
      val got = Curriculum.order(df, col("doc_id"), col("diff"), buckets)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos"))
        .toMap
      val want = data.sortBy { case (id, d) => (d, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
      got == want
    }, n = 5)
  }

  test("prop: PageRank total mass stays within (1-d)·(the dropped " +
    "dangling share) of 1 and every rank is ≥ the base floor") {
    val edges = Gen.listOf(Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 8L)))
      .map(_.filter(e => e._1 != e._2).distinct)
    check(Prop.forAll(edges) { es =>
      val nodes = (0L to 8L).toDF("id")
      val e = if (es.isEmpty) Seq((0L, 1L)) else es
      val pr = PageRank.run(nodes, e.toDF("src", "dst"), iters = 2)
        .collect().map(_.getAs[Double]("pr"))
      val floor = 0.15 / 9 - 1e-9
      // mass only ever LEAKS (dangling drop) — never inflates
      pr.forall(_ >= floor) && pr.sum <= 1.0 + 1e-9
    }, n = 5)
  }

  test("prop: SemanticDedup keeps exactly one survivor per exact-duplicate " +
    "group and re-dedup of survivors is the identity") {
    val groups = Gen.nonEmptyListOf(Gen.choose(0, 3)).map(_.take(12))
    check(Prop.forAll(groups) { gs =>
      // orthogonal unit axes per group id → duplicates are exact
      // (cosine 1), cross-group cosine 0
      val vecs = gs.zipWithIndex.map { case (g, i) =>
        (i.toLong, Seq.tabulate(4)(d => if (d == g) 1.0 else 0.0))
      }
      val df = vecs.toDF("id", "vec")
      val out = SemanticDedup.dedupe(df, k = 4, iters = 1, minCosine = 0.9)
        .collect()
      val kept = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("id"))
      val wantKept = vecs.groupBy(_._2).values.map(_.map(_._1).min).toSet
      val again = SemanticDedup.dedupe(
        df.filter(col("id").isin(kept: _*)), k = 4, iters = 1,
        minCosine = 0.9).collect()
      kept.toSet == wantKept && again.forall(_.getAs[Boolean]("keep"))
    }, n = 5)
  }

  test("prop: Bm25 scores are positive for matching terms and the rank " +
    "column is dense 1..m per term") {
    val docs = Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.oneOf(
      "alpha", "beta", "gamma", "delta")).map(_.take(6).mkString(" ")))
      .map(_.take(8))
    check(Prop.forAll(docs) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Bm25.topK(df, "doc_id", col("text"),
        Seq("alpha", "gamma").toDF("term"), k = 100).collect()
      val byTerm = out.groupBy(_.getAs[String]("term"))
      out.forall(_.getAs[Double]("score") > 0) && byTerm.values.forall {
        rs => rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length)
      }
    }, n = 5)
  }

  // random event logs: (user 0-3, kind, us 0-50, id unique by index)
  private val eventLog: Gen[List[(Long, String, Long)]] = Gen
    .nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L),
      Gen.oneOf("view", "click", "purchase"), Gen.choose(0L, 50L)))
    .map(_.take(40))

  test("prop: funnel stage times are strictly increasing where reached, " +
    "and input order never matters") {
    check(Prop.forAll(eventLog) { rows =>
      val df = rows.zipWithIndex
        .map { case ((u, k, t), i) => (u, k, t * 1000, i.toLong) }
        .toDF("u", "k", "us", "id")
      val stages = Seq("view", "click", "purchase")
      def run(d: org.apache.spark.sql.DataFrame) =
        Funnel.steps(d, col("u"), col("k"), col("us"), stages)
          .orderBy("user_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getInt(4))).toSeq
      val out = run(df)
      val monotone = out.forall { case (_, v, c, p, steps) =>
        (c == -1 || c > v) && (p == -1 || (c != -1 && p > c)) &&
          steps == 1 + (if (c != -1) 1 else 0) + (if (p != -1) 1 else 0)
      }
      monotone && out == run(df.repartition(5).orderBy("us"))
    }, n = 5)
  }

  test("prop: scd2 intervals tile each user's timeline — consecutive " +
    "attrs differ, eff_to chains to the next eff_from, one open tail") {
    check(Prop.forAll(eventLog) { rows =>
      val df = rows.zipWithIndex
        .map { case ((u, k, t), i) => (u, k, t * 1000, i.toLong) }
        .toDF("u", "k", "us", "id")
      val out = Scd2.build(df, col("u"), col("k"), col("us"), col("id"))
        .orderBy("user_id", "eff_from_ms").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getInt(4)))
      out.groupBy(_._1).values.forall { ivs =>
        val chainOk = ivs.sliding(2).forall {
          case Array(a, b) => a._4 == b._3 && a._2 != b._2 && a._5 == 0
          case _ => true
        }
        chainOk && ivs.last._4 == -1L && ivs.last._5 == 1 &&
          ivs.count(_._5 == 1) == 1
      }
    }, n = 5)
  }
}
