package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge.
  *
  * Spark 4 split the user-facing `Column` from Catalyst `Expression`
  * (columnNodeSupport.scala) and made the converters `private[sql]`.
  * Custom native expressions still need both directions; this object
  * re-exports them from inside the sql package — the standard pattern
  * for Spark extension libraries building custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression as a SQL function on an EXISTING
    * session (SparkSessionExtensions only applies at session build —
    * this is the post-hoc path for sessions we don't construct). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
