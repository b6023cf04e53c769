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
}
