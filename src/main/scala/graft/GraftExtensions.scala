package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProductExpr

/** Session extensions exposing the engine's native expressions to SQL
  * (`spark.sql("... dot_product(a, b) ...")`).
  *
  * Two registration paths:
  *  - at session build: `.withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.GraftExtensions`;
  *  - post-hoc on an existing session: [[GraftExtensions.register]]
  *    (driver-owned sessions we don't construct, e.g. notebook envs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "cosine_sim"),
      GraftExtensions.cosineBuilder))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}

  /** cosine_sim(a, b) = dot(a,b) / (√dot(a,a) · √dot(b,b)) — composed
    * entirely from codegen expressions, so the SQL surface matches the
    * Column-level [[graft.operators.Similarity.cosine]] bit-for-bit. */
  private[graft] val cosineBuilder: Seq[Expression] => Expression = exprs => {
    val (a, b) = (exprs(0), exprs(1))
    Divide(DotProductExpr(a, b),
      Multiply(Sqrt(DotProductExpr(a, a)), Sqrt(DotProductExpr(b, b))))
  }

  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)))
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "cosine_sim", cosineBuilder)
  }
}
