package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent in-memory reference: canonical BPE merge learning over
    * a word histogram (segmentations as symbol vectors, argmax by
    * (count desc, lhs asc, rhs asc), apply merges ALL adjacent
    * occurrences left to right). */
  private def referenceMerges(words: Map[String, Long],
                              rounds: Int): Seq[(String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(String, String, Long)]
    (1 to rounds).foreach { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) =>
          (-c, x, y)
        }
        out += ((a, b, n))
        segs = segs.groupMapReduce { case (s, _) =>
          val r = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              r += a + b; i += 2
            } else { r += s(i); i += 1 }
          }
          r.result()
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("learned merges equal the canonical in-memory reference") {
    // a corpus with repeated stems so merges chain (h+u, hu+g, ...)
    // AND a word with consecutive identical pairs (ababab) so the
    // overlapping-occurrence apply path is exercised
    val docs = Seq(
      "hug hug hug pug pun bun hugs",
      "hug pug pun ababab abab",
      "hugs hug pug bun").toDF("text")
    val got = Bpe.learnMerges(docs, col("text"), rounds = 6)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    val words = docs.as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    assert(got == referenceMerges(words, 6),
      s"got $got\nref ${referenceMerges(words, 6)}")
  }

  test("merge application is all-occurrences: 'a b a b' collapses fully") {
    // pinned directly: the double-space delimiter encoding must let
    // leftmost-nonoverlapping replace() merge BOTH (a,b) occurrences
    val seg = Seq("  a  b  a  b  ").toDF("seg")
      .withColumn("__find", lit(" a  b "))
      .withColumn("__repl", lit(" ab "))
      .select(expr("replace(seg, __find, __repl)").as("seg"))
      .as[String].head()
    assert(seg == "  ab  ab  ", s"got '$seg'")
  }

  test("single-character and empty-pair corpora terminate cleanly") {
    val docs = Seq("a b c", "a b").toDF("text")
    // every word is one symbol — no pairs exist, so no merges learned
    val got = Bpe.learnMerges(docs, col("text"), rounds = 3).collect()
    assert(got.isEmpty)
  }
}
