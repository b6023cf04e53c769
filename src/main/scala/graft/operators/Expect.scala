package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — declarative constraints evaluated in ONE
  * pass over the dataset (every rule is a conditional count inside a
  * single aggregate, so checking ten rules costs the same scan as
  * checking one). The gate a production pipeline runs between "computed"
  * and "published": fail the step when any rule reports violations.
  *
  * Uniqueness is the exception — it needs its own aggregation (count by
  * key), appended as a second tiny plan unioned onto the result.
  */
object Expect {

  /** A named row-level predicate that must hold. */
  final case class Rule(name: String, holds: Column)

  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNull || (col(c) >= lo && col(c) <= hi))
  def inSet(c: String, values: Seq[Any]): Rule =
    Rule(s"in_set_$c", col(c).isNull || col(c).isin(values: _*))
  def matches(c: String, regex: String): Rule =
    Rule(s"matches_$c", col(c).isNull || col(c).rlike(regex))

  /** One row per rule: (rule, n_rows, n_violations). Sums coalesce to 0
    * so an EMPTY input reports zero violations explicitly — a NULL here
    * would make a `n_violations > 0` gate silently pass (fail-open) on
    * the classic upstream-produced-nothing incident; pair the gate with
    * an n_rows check. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expect.check: no rules given")
    val aggs = count(lit(1)).as("__n") +: rules.map(r =>
      coalesce(sum(when(r.holds, 0L).otherwise(1L)), lit(0L)).as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    rules.map { r =>
      row.select(lit(r.name).as("rule"), col("__n").as("n_rows"),
        col(r.name).as("n_violations"))
    }.reduce(_.unionByName(_))
  }

  /** Key-uniqueness expectation: (rule, n_rows, n_violations) where a
    * violation is every row beyond the first of a duplicated key. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
        coalesce(sum(col("__c") - 1), lit(0L)).as("n_violations"))
      .select(lit(s"unique_${keys.mkString("_")}").as("rule"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_violations").cast("long").as("n_violations"))
}
