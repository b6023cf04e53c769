package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression for the text-scoring hot path.
  *
  * `size(filter(toks, x -> x IN (w1..wk)))` — the language-ID marker
  * scores and the stopword counter — runs on Catalyst's higher-order
  * `ArrayFilter`, which is CodegenFallback: per-row INTERPRETED lambda
  * evaluation plus a filtered-array allocation per language, in exactly
  * the projections a corpus-cleaning pipeline runs over every document.
  * This expression is the same membership count as a single codegen'd
  * loop over the token array against a shared `HashSet[UTF8String]`:
  * no allocation, no lambda dispatch, and it participates in
  * whole-stage codegen so the whole quality-filter battery stays in one
  * generated function (the [[DotProductExpr]] pattern applied to text).
  *
  * Semantics are identical to the lambda form: binary UTF8 equality
  * (`IN` on strings), null elements never match (the lambda's null
  * predicate drops them), a null array propagates null.
  */
case class ArrayCountInSetExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set needs array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // the word set is built once on the driver and shipped in the
    // references array — per-row work is hash lookups only
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$v.isNullAt($i) && $setRef.contains($v.getUTF8String($i))) {
         |    $c++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): ArrayCountInSetExpr = copy(child = newChild)
}

object TextFunctions {
  /** Column API for [[ArrayCountInSetExpr]]: how many elements of the
    * string array `arr` are members of `words`. */
  def countInSet(arr: Column, words: Seq[String]): Column =
    Bridge.column(ArrayCountInSetExpr(Bridge.expression(arr), words))
}
