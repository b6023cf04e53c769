package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification via stopword-marker counts
  * (north-star scope, SURVEY §7.6).
  *
  * Scores each language by the number of tokens hitting its marker list,
  * then picks the winner with a fixed-priority cascade (ties resolve to
  * the earlier language in [[markers]] order — deterministic, oracle-
  * reproducible). Pure projection: no shuffle, stays in codegen.
  *
  * This is the n-gram-free baseline; swapping in character-trigram
  * profiles only changes the score expressions, not the shape.
  */
object LangId {
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "est", "une"),
    "es" -> Seq("el", "los", "de", "y", "es", "una"))

  def apply(df: DataFrame, text: Column): DataFrame = {
    val withToks = df.withColumn("__toks", TextStats.tokens(text))
    // native codegen membership count — a filter(x -> x IN (...)) lambda
    // here would run interpreted (ArrayFilter is CodegenFallback) on
    // every document of the corpus; see ArrayCountInSetExpr
    val scored = markers.foldLeft(withToks) { case (acc, (lang, words)) =>
      acc.withColumn(s"score_$lang",
        graft.functions.TextFunctions.countInSet(col("__toks"), words))
    }
    // fixed-priority argmax: first language with score >= all later ones
    val langs = markers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val rest = langs.drop(i + 1)
        val geAll = rest.map(o => col(s"score_$lang") >= col(s"score_$o"))
          .reduce(_ && _)
        when(geAll, lang).otherwise(elseCol)
    }
    scored.withColumn("lang_pred", pred).drop("__toks")
  }
}
