package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Resample (mixture rebalancing) + Scrub (PII redaction) unit
  * contracts on hand-computable fixtures. */
class CurationOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a"), (2L, "a"),           // stratum a: 2 rows
    (3L, "b"), (4L, "b"), (5L, "b") // stratum b: 3 rows
  ).toDF("id", "st")

  test("Resample: integer rate replicates exactly (no hash dependence)") {
    // weights a=1, b=1, budget 10 -> target 5 each; a: r=2.5, b: r=5/3
    // use budget 8 -> target 4: a r=2.0 exact, b r=4/3 fractional
    val out = Resample.toMixture(docs, col("id"), col("st"),
      Map("a" -> 1.0, "b" -> 1.0), budget = 8L)
    val byId = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 2L && byId(2L) == 2L)   // floor(2.0), frac 0
    assert(Seq(3L, 4L, 5L).forall(i =>
      byId(i) == 1L || byId(i) == 2L))         // floor(4/3)=1 + Bern(1/3)
  }

  test("Resample: deterministic across runs and partitionings") {
    val w = Map("a" -> 3.0, "b" -> 1.0)
    val r1 = Resample.toMixture(docs, col("id"), col("st"), w, 7L)
      .orderBy("id", "copy_idx").collect().toSeq
    val r2 = Resample.toMixture(docs.repartition(7), col("id"), col("st"),
      w, 7L).orderBy("id", "copy_idx").collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("Resample.byWeight: w>=1 always kept, w=0 never, fractional " +
    "deterministic and partitioning-stable") {
    val weighted = (1L to 400L).toDF("id")
      .withColumn("weight",
        when(col("id") <= 100L, 1.0)
          .when(col("id") <= 200L, 0.0)
          .otherwise(0.5))
    val kept = Resample.byWeight(weighted, col("id"), col("weight"))
    val byBand = kept.groupBy(col("weight")).count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byBand(1.0) == 100L)                  // certainty keeps all
    assert(!byBand.contains(0.0))                // zero keeps none
    val half = byBand(0.5)
    assert(half > 60L && half < 140L, s"Bern(0.5) kept $half of 200")
    // pure function of (id, weight): invariant to physical layout
    val again = Resample.byWeight(weighted.repartition(13), col("id"),
      col("weight")).orderBy("id").collect().toSeq
    assert(again == kept.orderBy("id").collect().toSeq)
  }

  test("Resample: default weight 0 drops unlisted strata; downsampling thins") {
    val out = Resample.toMixture(docs, col("id"), col("st"),
      Map("b" -> 1.0), budget = 2L) // a dropped; b: r=2/3 -> copies in {0,1}
    val sts = out.select("st").distinct().collect().map(_.getString(0))
    assert(!sts.contains("a"))
    val n = out.count()
    assert(n >= 0 && n <= 3, s"expected <=1 copy per b row, got $n")
    val perId = out.groupBy("id").count().collect().map(_.getLong(1))
    assert(perId.forall(_ == 1L))
  }

  private val pii = Seq(
    (1L, "mail a.b+c@x-y.co or ops@ex.org from 10.1.2.3 call 555-0199"),
    (2L, "no pii here just words"),
    (3L, "digits 1234-56789 are not a phone; 1.2.3.4.5 hmm"))
    .toDF("id", "text")

  test("Scrub: redacts emails, IPs, phones with counts") {
    val r = Scrub.scrub(pii, col("id"), col("text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    val r1 = r(1L)
    assert(r1.getAs[Long]("n_emails") == 2L)
    assert(r1.getAs[Long]("n_ips") == 1L)
    assert(r1.getAs[Long]("n_phones") == 1L)
    assert(r1.getAs[String]("clean") ==
      "mail <EMAIL> or <EMAIL> from <IP> call <PHONE>")
    val r2 = r(2L)
    assert(r2.getAs[String]("clean") == "no pii here just words" &&
      r2.getAs[Long]("n_emails") == 0L)
  }

  test("Scrub: word boundaries stop over-matching") {
    val r3 = Scrub.scrub(pii, col("id"), col("text"))
      .filter(col("doc_id") === 3L).collect().head
    // 1234-56789: \b\d{3}-\d{4}\b can't anchor inside the digit run
    assert(r3.getAs[Long]("n_phones") == 0L)
    // 1.2.3.4.5: the IP pattern matches the leading 1.2.3.4 (the .5
    // tail fails \b only for the digit after the matched span's dot —
    // same leftmost semantics both engines); assert parity w/ count
    assert(r3.getAs[Long]("n_ips") ==
      r3.getAs[String]("clean").sliding(4).count(_ == "<IP>"))
  }
}
