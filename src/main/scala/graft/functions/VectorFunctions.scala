package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * `aggregate(zip_with(a, b, ...))` materializes an intermediate array
  * per evaluation — fatal inside an all-pairs similarity join (measured
  * ~100× slower than DuckDB's vectorized list_dot_product at sf0.1).
  * This expression is a straight multiply-accumulate loop over the two
  * ArrayData buffers with full codegen: no allocation, no virtual calls
  * in the loop, and it participates in whole-stage codegen so the
  * surrounding join filter stays in one generated function.
  *
  * Summation order is left-to-right like the lambda fold and DuckDB's
  * list_dot_product, so results stay bit-identical to the SQL oracle.
  *
  * Null handling: null arrays propagate null (BinaryExpression default);
  * null ELEMENTS are not expected in embedding columns and read as 0.0
  * via ArrayData.getDouble — callers cast/clean upstream.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $l.getDouble($i) * $r.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen projection of a vector onto deterministic pseudo-random
  * hyperplane `plane`: Σᵢ vᵢ · cᵢ where
  * cᵢ = (((i + plane·7919 + 13) · 2654435761) mod 104729) / 104729.0 · 2 − 1
  * — the seed-free integer mix the LSH sign-buckets are built on
  * (stable across runs AND engines; the same formula is spelled out in
  * the lsh_ann DuckDB oracle). Replaces the
  * `aggregate(zip_with(sequence(...)))` formulation, whose higher-order
  * lambdas evaluate INTERPRETED per element; the loop here is identical
  * arithmetic in identical order (exact long mix, one double division,
  * left-to-right accumulation), so buckets stay bit-equal while the
  * whole projection runs inside whole-stage codegen.
  */
case class PlaneProjectExpr(child: Expression, plane: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"plane_project needs array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"plane_project_$plane"

  private val k: Long = plane.toLong * 7919L + 13L

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val mixed = ((i + k) * 2654435761L) % 104729L
      s += x.getDouble(i) * (mixed / 104729.0 * 2.0 - 1.0)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val mixed = ctx.freshName("mixed")
      s"""
         |int $n = $v.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $mixed = (($i + ${k}L) * 2654435761L) % 104729L;
         |  $acc += $v.getDouble($i) * ($mixed / 104729.0 * 2.0 - 1.0);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PlaneProjectExpr = copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.functions._

  /** Column API for [[DotProductExpr]] (double arrays in, double out). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[PlaneProjectExpr]]. */
  def planeProject(vec: Column, plane: Int): Column =
    Bridge.column(PlaneProjectExpr(Bridge.expression(vec), plane))

  /** Int8 scalar quantization for embedding STORAGE: clamp to [-1, 1],
    * scale by 127, round half-away-from-zero → `array<tinyint>`, 4× (8×
    * vs double) smaller than the float form — the standard space/recall
    * trade for 100 TB ANN indexes (store quantized, rank quantized,
    * optionally re-rank survivors on full precision). Deterministic and
    * engine-reproducible: IEEE multiply + round-half-up is identical in
    * Spark and DuckDB, so quantized searches stay oracle-checkable.
    * Lambda-based transform is fine HERE because quantization runs once
    * per vector at ingest/index-build, not inside a pair join. */
  def quantizeInt8(v: Column): Column =
    transform(v, x =>
      round(greatest(least(x, lit(1.0)), lit(-1.0)) * 127).cast("tinyint"))

  /** Inverse mapping back to unit-scale doubles for scoring. */
  def dequantizeInt8(q: Column): Column =
    transform(q, x => x.cast("double") / lit(127.0))
}
