package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class ChunkHistogramSpec extends SparkSpecBase {
  import spark.implicits._

  test("Chunker: windows cover the text with the configured overlap") {
    val df = Seq((1L, "a" * 500)).toDF("doc_id", "text")
    val chunks = Chunker.chunk(df, col("doc_id"), col("text"), 200, 40)
      .orderBy("chunk_idx").collect()
    // starts: 1, 161, 321, 441-cap -> greatest(500-40,1)=460 => 1,161,321
    assert(chunks.length == 3)
    assert(chunks.map(_.getAs[Int]("chunk_len")).toSeq == Seq(200, 200, 180))
    // consecutive chunks share `overlap` characters
    val t0 = chunks(0).getAs[String]("chunk_text")
    val t1 = chunks(1).getAs[String]("chunk_text")
    assert(t0.takeRight(40) == t1.take(40))
  }

  test("Chunker: short text yields exactly one chunk") {
    val df = Seq((1L, "short")).toDF("doc_id", "text")
    val chunks = Chunker.chunk(df, col("doc_id"), col("text"), 200, 40)
      .collect()
    assert(chunks.length == 1 && chunks.head.getAs[String]("chunk_text") == "short")
  }

  test("Histogram: bins partition the domain; counts total input") {
    val df = Seq(("a", 0.0), ("a", 24.9), ("a", 25.0), ("a", 99.9))
      .toDF("k", "value")
    val h = Histogram(df, Seq("k"), col("value"), 25.0).collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
    assert(h == Map(0L -> 2, 1L -> 1, 3L -> 1))
  }
}
