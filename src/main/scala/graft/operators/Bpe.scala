package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.types._

/** BPE vocabulary induction (north-star scope, SURVEY §7.6: the
  * tokenizer-training side of a pretraining pipeline — Sennrich et
  * al.'s byte-pair-encoding merge learning, public knowledge).
  *
  * Classic BPE: start from characters, repeatedly merge the most
  * frequent adjacent symbol pair across the corpus. Each round is two
  * distributed steps — a pair-frequency aggregate (explode adjacent
  * pairs, one hash aggregate with map-side partials, weighted by word
  * frequency so the corpus collapses to its word histogram first) and
  * a merge application (stateless projection). The ONLY driver
  * traffic is one argmax row per round (like [[Ivf]]'s k centroids:
  * constant-size by construction).
  *
  * Merge application uses a delimiter encoding instead of a per-row
  * lambda fold: a word's segmentation is kept as a string with TWO
  * spaces between symbols and two at the ends (`"  h  u  g  "`), and
  * merging pair (a, b) is `replace(seg, " a  b ", " ab ")`. The
  * single-space padding means consecutive occurrences (`a b a b`)
  * do NOT share delimiter characters, so leftmost-nonoverlapping
  * `replace` — the same scan both engines implement — merges ALL
  * adjacent occurrences, which is exactly canonical BPE's apply step
  * (pinned by BpeSpec against an independent in-memory reference).
  * Ties in the argmax break by (pair count desc, left asc, right asc)
  * — a total order, so the learned table is deterministic and
  * bit-comparable cross-engine.
  *
  * Scale shape: the word histogram is vocabulary-sized (≪ corpus);
  * every per-round job is one exchange keyed by the candidate pair.
  * Rounds are a small constant; each round's segmentation persists and
  * the previous unpersists, so lineage stays flat.
  */
object Bpe {

  /** Learn `rounds` merges from whitespace-tokenized `text`.
    * @return one row per merge: (merge_rank, lhs, rhs, merged, n) in
    *         learning order; `n` is the corpus-wide occurrence count
    *         that won the round. */
  def learnMerges(docs: DataFrame, text: Column, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextStats.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var seg = words.withColumn("seg",
        concat(lit("  "),
          concat_ws("  ", filter(split(col("w"), ""), s => s =!= "")),
          lit("  ")))
      .select("freq", "seg")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = Seq.newBuilder[Row]
    (1 to rounds).foreach { r =>
      val arr = split(trim(col("seg")), "  ")
      val top = seg
        .withColumn("__arr", arr)
        .filter(size(col("__arr")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(0), size(col("__arr")) - 2),
          i => struct(element_at(col("__arr"), i + 1).as("lhs"),
            element_at(col("__arr"), i + 2).as("rhs")))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += Row(r, a, b, a + b, n)
        val next = seg
          .withColumn("__find", lit(s" $a  $b "))
          .withColumn("__repl", lit(s" $a$b "))
          .withColumn("seg", expr("replace(seg, __find, __repl)"))
          .select("freq", "seg")
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the parent
        seg.unpersist()
        seg = next
      }
    }
    seg.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  /** Apply an ordered merge list (the tokenizer's "encode" side):
    * per document, the whitespace word count and the BPE symbol count
    * after every merge is applied — the number a packing/budgeting
    * step actually wants once a tokenizer exists. One explode + the
    * R-deep replace chain (stateless codegen projections) + one hash
    * aggregate; the merge list is a constant-size driver value (it IS
    * the output of [[learnMerges]]), so nothing data-sized leaves the
    * executors. */
  def segmentCounts(docs: DataFrame, id: Column, text: Column,
                    merges: Seq[(String, String)]): DataFrame = {
    var d = docs
      .select(id.as("id"), explode(TextStats.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .withColumn("seg",
        concat(lit("  "),
          concat_ws("  ", filter(split(col("w"), ""), s => s =!= "")),
          lit("  ")))
    merges.foreach { case (a, b) =>
      d = d.withColumn("__find", lit(s" $a  $b "))
        .withColumn("__repl", lit(s" $a$b "))
        .withColumn("seg", expr("replace(seg, __find, __repl)"))
    }
    d.groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(trim(col("seg")), "  "))).cast("long")
          .as("n_bpe_tokens"))
  }
}
