package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class BudgetSpec extends SparkSpecBase {
  import spark.implicits._

  test("percentileFilter ranks FRACTIONAL scores correctly (no integer " +
    "truncation) and equals the naive percent_rank window") {
    // 0.73-style lm/dsir scores: a long cast would collapse them all to
    // 0 and rank by doc_id — the silent-wrong case the fix removes
    val rows = Seq(
      (1L, "a", 0.73), (2L, "a", 0.12), (3L, "a", 0.91), (4L, "a", 0.12),
      (5L, "b", 0.50), (6L, "b", 0.49), (7L, "b", 0.51))
    val df = rows.toDF("doc_id", "source", "score")
    val got = Budget.percentileFilter(df, col("doc_id"), col("source"),
        col("score"), minPct = 0.5, buckets = 3)
      .select("doc_id", "pct_rank", "kept")
    val w = Window.partitionBy("source").orderBy("score", "doc_id")
    val want = df
      .withColumn("pct_rank", percent_rank().over(w))
      .select(col("doc_id"), col("pct_rank"),
        (col("pct_rank") >= 0.5).as("kept"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"got ${got.collect().toSeq}\nwant ${want.collect().toSeq}")
    // the output score column keeps its original (double) type
    val schema = Budget.percentileFilter(df, col("doc_id"), col("source"),
      col("score"), minPct = 0.5).schema
    assert(schema("score").dataType.typeName == "double")
  }

  test("percentileFilter: all scores equal degenerates to one bucket, " +
    "ranks by doc_id") {
    val df = Seq((1L, "a", 2.5), (2L, "a", 2.5), (3L, "a", 2.5))
      .toDF("doc_id", "source", "score")
    val got = Budget.percentileFilter(df, col("doc_id"), col("source"),
        col("score"), minPct = 0.5)
      .orderBy("doc_id").select("pct_rank").as[Double].collect().toSeq
    assert(got == Seq(0.0, 0.5, 1.0))
  }

  test("null keys error loudly instead of bypassing the budget/floor " +
    "or dropping rows") {
    val nullId = Seq((Some(1L), "a", 10L), (None, "a", 20L))
      .toDF("doc_id", "source", "n_tokens")
    val e1 = intercept[IllegalArgumentException] {
      Budget.capTokens(nullId, col("doc_id"), col("source"),
        col("n_tokens"), budget = 100L)
    }
    assert(e1.getMessage.contains("null doc_id"))
    val nullScore = Seq((1L, "a", Some(0.5)), (2L, "a", None))
      .toDF("doc_id", "source", "score")
    val e2 = intercept[IllegalArgumentException] {
      Budget.percentileFilter(nullScore, col("doc_id"), col("source"),
        col("score"), minPct = 0.25)
    }
    assert(e2.getMessage.contains("null score"))
    val nullDiff = Seq((1L, Some(5L)), (2L, None)).toDF("id", "diff")
    val e3 = intercept[IllegalArgumentException] {
      Curriculum.order(nullDiff, col("id"), col("diff"))
    }
    assert(e3.getMessage.contains("null difficulty"))
  }

  test("empty input still returns empty (not an error)") {
    val empty = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "source", "n_tokens")
    assert(Budget.capTokens(empty, col("doc_id"), col("source"),
      col("n_tokens"), budget = 10L).count() == 0)
    assert(Budget.percentileFilter(empty, col("doc_id"), col("source"),
      col("n_tokens"), minPct = 0.5).count() == 0)
    assert(Curriculum.order(empty.select(col("doc_id").as("id"),
      col("n_tokens").as("diff")), col("id"), col("diff")).count() == 0)
  }

  test("Dsir.weights keeps token-free docs: one row per doc, " +
    "n_tokens 0, null mean_ratio") {
    // null text is the token-free case this tokenizer produces (empty
    // text still yields one ""-token — same as the oracle's unnest)
    val docs = Seq((1L, "alpha beta gamma"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val tgt = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Dsir.weights(docs, tgt, "doc_id", col("text"), b = 16)
      .orderBy("doc_id").collect()
    assert(out.length == 3, s"want one row per doc, got ${out.length}")
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(3))
    assert(out(2).getLong(1) == 1L)
    assert(out(0).getLong(1) == 3L)
  }
}
