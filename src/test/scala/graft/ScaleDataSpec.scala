package graft

import org.apache.spark.sql.functions._

/** ScaleData (the committed scale-proof corpus builder): replica-0
  * identity, disjoint id/content spaces, exact row multiplication —
  * the properties that make BASELINE.md's scaled corpora a fair
  * scale-up (no cross-replica near-dups, no manufactured quadratic).
  */
class ScaleDataSpec extends SparkSpecBase {

  private val R = 3

  test("documents: rows xR, replica 0 bit-identical, token spaces " +
    "disjoint across replicas") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    val scaled = ScaleData.scale("documents", base, R).cache()
    assert(scaled.count() == base.count() * R)
    // replica 0 (ids below the stride) is the base table verbatim
    val stride = scaled.agg(max("doc_id")).head().getLong(0) / R + 1
    val r0 = scaled.filter(col("doc_id") < lit(stride))
    assert(r0.exceptAll(base).isEmpty && base.exceptAll(r0).isEmpty)
    // token vocabularies of different replicas never intersect (this
    // is what keeps pair-generating ops at xR, not xR^2)
    val toks = scaled.select((col("doc_id") / lit(stride)).cast("int")
        .as("r"), explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).distinct()
    val shared = toks.groupBy("t")
      .agg(countDistinct("r").as("nr")).filter(col("nr") > 1)
    assert(shared.isEmpty,
      s"cross-replica tokens: ${shared.head(5).mkString(", ")}")
    scaled.unpersist()
  }

  test("lineitem: key spaces shift per replica — the co-purchase graph " +
    "is R disjoint copies") {
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
    val scaled = ScaleData.scale("lineitem", base, R).cache()
    assert(scaled.count() == base.count() * R)
    // orderkey and partkey replicas agree (an order never spans replicas)
    val stride = scaled.agg(max("l_orderkey")).head().getLong(0) / R + 1
    val mixed = scaled.filter(
      (col("l_orderkey") / lit(stride)).cast("int") =!=
        (col("l_partkey") / lit(stride)).cast("int"))
    assert(mixed.isEmpty)
    // non-key columns replicate verbatim: per-replica quantity sums match
    val baseSum = base.agg(sum("l_quantity")).head().getDouble(0)
    val perReplica = scaled
      .groupBy((col("l_orderkey") / lit(stride)).cast("int").as("r"))
      .agg(sum("l_quantity").as("s")).collect()
    assert(perReplica.length == R)
    perReplica.foreach(row =>
      assert(math.abs(row.getDouble(1) - baseSum) < 1e-6))
    scaled.unpersist()
  }

  test("full-schema scale-up keeps FKs consistent: equi-joins grow " +
    "exactly xR, fixed dims stay single-copy") {
    def rd(t: String) = spark.read.parquet(s"$sf/$t.parquet")
    val shared = ScaleData.globalStride(spark, sf,
      Seq("lineitem", "orders", "customer", "supplier", "part",
        "events", "documents", "embeddings"))
    def sc(t: String) = ScaleData.scale(t, rd(t), R, Some(shared))
    val li = sc("lineitem").cache()
    val ord = sc("orders").cache()
    val cust = sc("customer").cache()
    val nat = sc("nation")
    // lineitem ⋈ orders: every line finds exactly its order in its own
    // replica — never R² (verbatim replication would), never dangling
    val baseLiOrd = rd("lineitem").join(rd("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      == baseLiOrd * R)
    assert(li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .isEmpty, "dangling l_orderkey FK after scale-up")
    // orders ⋈ customer likewise
    assert(ord.join(cust, col("o_custkey") === col("c_custkey"),
      "left_anti").isEmpty, "dangling o_custkey FK after scale-up")
    // fixed dims: single copy, and every (replicated) customer still
    // resolves its nation
    assert(nat.count() == rd("nation").count())
    assert(cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .count() == cust.count())
    Seq(li, ord, cust).foreach(_.unpersist())
  }

  test("embeddings: per-replica sign pattern decorrelates replicas but " +
    "keeps norms (replica 0 untouched)") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val scaled = ScaleData.scale("embeddings", base, R).cache()
    assert(scaled.count() == base.count() * R)
    val stride = scaled.agg(max("vec_id")).head().getLong(0) / R + 1
    // norms are sign-invariant: per-replica sum of squared norms equal
    val norm2 = aggregate(transform(col("embedding"),
      x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val norms = scaled
      .groupBy((col("vec_id") / lit(stride)).cast("int").as("r"))
      .agg(sum(norm2).as("s")).collect().map(r => r.getDouble(1))
    assert(norms.length == R)
    norms.foreach(s => assert(math.abs(s - norms.head) < 1e-6))
    // but replica 1 vectors differ from replica 0 (signs flipped)
    val r0 = scaled.filter(col("vec_id") < lit(stride))
      .select(col("vec_id"), col("embedding"))
    val r1 = scaled.filter(col("vec_id") >= lit(stride) &&
        col("vec_id") < lit(2 * stride))
      .select((col("vec_id") - lit(stride)).as("vec_id"),
        col("embedding").as("e1"))
    val diff = r0.join(r1, "vec_id")
      .filter(col("embedding") =!= col("e1"))
    assert(diff.count() > 0)
    scaled.unpersist()
  }
}
