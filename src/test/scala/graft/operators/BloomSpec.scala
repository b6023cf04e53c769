package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Bloom membership sketch: no false negatives, bounded false
  * positives, partial-merge law, bounded size, NULL semantics. */
class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  private val k = 4
  private val m = 4096

  private def strs(prefix: String, n: Int) =
    (0 until n).map(i => s"$prefix-$i").toDF("v")

  test("no false negatives: every inserted value probes true") {
    val in = strs("in", 500)
    val f = Bloom.build(in, col("v"), k, m)
    val probed = Bloom.probe(in, col("v"), col("v"), f, k, m)
    assert(probed.filter(!col("maybe_member")).isEmpty)
  }

  test("a filter with DUPLICATE position rows still has no false " +
      "negatives (probe dedups defensively)") {
    // filter_path parquet from an arbitrary producer may carry dup
    // rows; without the internal distinct they multiply join matches
    // (__nh > __np) and flip true members to FALSE — ADVICE r8 pin
    val in = strs("in", 200)
    val f = Bloom.build(in, col("v"), k, m)
    val dup = f.unionAll(f).unionAll(f.limit(7))
    val probed = Bloom.probe(in, col("v"), col("v"), dup, k, m)
    assert(probed.filter(!col("maybe_member")).isEmpty)
  }

  test("false positives exist in principle but stay near (bits/m)^k") {
    val in = strs("in", 500)
    val f = Bloom.build(in, col("v"), k, m).cache()
    val bits = f.count()
    assert(bits <= m && bits <= 500L * k)
    val out = strs("out", 4000)
    val fp = Bloom.probe(out, col("v"), col("v"), f, k, m)
      .filter(col("maybe_member")).count()
    // expected rate (bits/m)^k ~ (2000/4096)^4 ~ 5.6%; assert a loose
    // 3x envelope so the test pins the mechanism, not the exact draw
    val bound = 3 * math.pow(bits.toDouble / m, k) * 4000
    assert(fp <= math.max(bound, 10), s"fp=$fp bound=$bound")
    f.unpersist()
  }

  test("merge law: union of partial filters == filter of the union") {
    val a = strs("a", 200); val b = strs("b", 300)
    val merged = Bloom.merge(
      Bloom.build(a, col("v"), k, m), Bloom.build(b, col("v"), k, m))
    val direct = Bloom.build(a.unionAll(b), col("v"), k, m)
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty)
  }

  test("positions: k distinct-capped lanes, all in [0, m)") {
    val ps = strs("x", 100)
      .select(explode(Bloom.positions(col("v"), k, m)).as("p"))
    assert(ps.filter(col("p") < 0 || col("p") >= m).isEmpty)
    val perVal = strs("x", 100)
      .select(size(Bloom.positions(col("v"), k, m)).as("n"))
    assert(perVal.filter(col("n") < 1 || col("n") > k).isEmpty)
  }

  test("memberExpr (literal streaming form) agrees with probe (join " +
    "form) on every value, members and non-members alike") {
    val in = strs("in", 300)
    val f = Bloom.build(in, col("v"), k, m)
    val bits = f.collect().map(_.getInt(0)).toSeq
    val mixed = strs("in", 600).unionAll(strs("out", 600))
      .withColumn("id", col("v"))
    val joinForm = Bloom.probe(mixed, col("id"), col("v"), f, k, m)
    val litForm = mixed.select(col("id"),
      Bloom.memberExpr(col("v"), bits, k, m).as("maybe_member"))
    assert(joinForm.exceptAll(litForm).isEmpty &&
      litForm.exceptAll(joinForm).isEmpty)
  }

  test("NULL value probes false and never enters the filter") {
    val in = Seq(Some("a"), Some("b"), None).toDF("v")
    val f = Bloom.build(in, col("v"), k, m)
    val probed = Bloom.probe(
      Seq((1, Some("a")), (2, None)).toDF("id", "v"),
      col("id"), col("v"), f, k, m).collect()
      .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(probed(1) && !probed(2))
  }
}
