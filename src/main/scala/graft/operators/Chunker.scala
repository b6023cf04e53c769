package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text chunking for training-data pipelines (north-star scope): split
  * documents into fixed-size character windows with overlap — the
  * pre-tokenization step of every context-window-bound pipeline.
  *
  * Pure generate + project: `sequence` of chunk starts → explode →
  * substring; no shuffle, codegen-friendly, output rows carry
  * (id, chunk_idx, chunk_text, chunk_len). Token-budget variants swap
  * the stride arithmetic only.
  *
  * Scale: row count multiplies by ~len/stride; chunking belongs AFTER
  * filters/dedup so the multiplier applies to surviving docs only.
  */
object Chunker {
  /** @param size   window size in characters
    * @param overlap characters shared by consecutive chunks */
  def chunk(df: DataFrame, id: Column, text: Column,
            size: Int, overlap: Int): DataFrame = {
    require(overlap < size, "overlap must be < size")
    val stride = size - overlap
    df.select(id.as("id"), text.as("__t"))
      .withColumn("__starts",
        sequence(lit(1), greatest(length(col("__t")) - lit(overlap), lit(1)),
          lit(stride)))
      .select(col("id"), col("__t"),
        posexplode(col("__starts")).as(Seq("chunk_idx", "__s")))
      .withColumn("chunk_text", expr(s"substring(__t, __s, $size)"))
      .drop("__s", "__t")
      .withColumn("chunk_len", length(col("chunk_text")))
  }
}
