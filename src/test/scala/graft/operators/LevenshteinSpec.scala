package graft.operators

import graft.SparkSpecBase
import graft.functions.{BandedLevenshtein, LevenshteinFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins band-vs-full equivalence for the iterative-deepening banded
  * Levenshtein: every value must equal Spark's builtin full-DP
  * `levenshtein` — the banded form is an OPTIMIZATION, never a
  * semantic change (the `edit_distance` oracle still checks the values
  * against DuckDB's levenshtein end to end).
  */
class LevenshteinSpec extends SparkSpecBase {

  private def d(a: String, b: String): Int =
    BandedLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("hand corpus: banded equals known distances") {
    // classic pins
    assert(d("kitten", "sitting") === 3)
    assert(d("flaw", "lawn") === 2)
    assert(d("", "") === 0)
    assert(d("", "abc") === 3)
    assert(d("abc", "") === 3)
    assert(d("same", "same") === 0)
    // distance far above the initial band (forces deepening): disjoint
    // alphabets of very different lengths
    assert(d("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "bbb") === 30)
    assert(d("abcdefghij".repeat(5), "jihgfedcba".repeat(5)) ===
      org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply("abcdefghij".repeat(5),
          "jihgfedcba".repeat(5)).intValue)
    // non-BMP code points count as ONE edit unit each (code-point
    // semantics, matching Spark's builtin and DuckDB)
    assert(d("a😀b", "ab") === 1)
    assert(d("😀", "😁") === 1)
  }

  test("randomized: banded == builtin levenshtein on near and far pairs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefg "
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      (0 until edits).foreach { _ =>
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        rnd.nextInt(3) match {
          case 0 if cur.nonEmpty => cur = cur.patch(p, "", 1) // delete
          case 1 => cur = cur.patch(p, alphabet(rnd.nextInt(8)).toString, 0)
          case _ if cur.nonEmpty =>
            cur = cur.updated(p, alphabet(rnd.nextInt(8)))
          case _ => ()
        }
      }
      cur
    }
    val pairs =
      // near-dup shape (the production case): few edits on long strings
      (0 until 40).map { _ =>
        val s = randStr(50 + rnd.nextInt(200))
        (s, mutate(s, 1 + rnd.nextInt(8)))
      } ++
        // far pairs: independent strings of unequal length
        (0 until 40).map(_ => (randStr(rnd.nextInt(60)),
          randStr(rnd.nextInt(60))))
    import spark.implicits._
    val df = pairs.toDF("a", "b").select(
      LevenshteinFunctions.bandedLevenshtein(col("a"), col("b"))
        .as("banded"),
      levenshtein(col("a"), col("b")).as("full"))
    val rows = df.collect()
    assert(rows.length === 80)
    rows.foreach(r => assert(r.getInt(0) === r.getInt(1),
      s"banded ${r.getInt(0)} != full ${r.getInt(1)}"))
  }

  test("codegen path evaluates (no fallback errors) and nulls propagate") {
    import spark.implicits._
    val df = Seq(("abc", "abd"), (null, "x"), ("x", null))
      .toDF("a", "b")
      .select(LevenshteinFunctions.bandedLevenshtein(col("a"), col("b"))
        .as("d"))
    val got = df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(got.toSeq === Seq(1, -1, -1))
  }
}
