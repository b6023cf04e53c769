package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** [[GopherRules]] unit contracts on hand-computable fixtures — the
  * line-anchor-free regex forms (the cross-engine-parity design) must
  * still count exactly what a (?m)-anchored form would on \n text. */
class GopherRulesSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(text: String, minWords: Long = 1,
                  minStopDistinct: Int = 0) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    GopherRules(df, col("text"), minWords = minWords,
      minStopDistinct = minStopDistinct).collect().head
  }

  test("bullet lines: first line, indented, and mid-doc all count; " +
    "a dash INSIDE a line does not") {
    val r = run("- first\n  * second\nplain - not a bullet\n• third")
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("bullet_line_ratio") == 3.0 / 4.0)
  }

  test("ellipsis lines: embedded ...\\n and end-of-string both count; " +
    "mid-line ... does not") {
    val r = run("wait...\nmore ... here\nfin...")
    assert(r.getAs[Double]("ellipsis_line_ratio") == 2.0 / 3.0)
    // the mid-line '...' DOES count as a symbol though
    assert(r.getAs[Double]("symbol_word_ratio") > 0.0)
  }

  test("alpha words counted once each; digit-only words excluded") {
    val r = run("ab3 123 x 9y9 42")
    assert(r.getAs[Long]("n_words") == 5L)
    assert(r.getAs[Double]("alpha_word_ratio") == 3.0 / 5.0)
  }

  test("mean word length ignores whitespace runs exactly") {
    val r = run("ab   cde\t\tf")
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Double]("mean_word_len") == 6.0 / 3.0)
  }

  test("distinct stop count is distinct, not total") {
    val r = run("the the the and and")
    assert(r.getAs[Int]("n_stop_distinct") == 2)
  }

  test("verdict precedence: word-count bound fires before later rules") {
    val r = run("# # #", minWords = 10)
    assert(r.getAs[String]("verdict") == "too_few_words")
    val r2 = run("# # # # #", minWords = 1)
    assert(r2.getAs[String]("verdict") == "short_words") // mean len 1 < 3
  }

  test("published defaults: a clean paragraph keeps") {
    val para = ("the quick brown fox jumps over that lazy dog and " +
      "runs with great speed to be free of all worry ") * 3
    val r = run(para, minWords = 10, minStopDistinct = 2)
    assert(r.getAs[String]("verdict") == "keep")
  }
}
