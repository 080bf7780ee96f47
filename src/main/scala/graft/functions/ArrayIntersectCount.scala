package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `array_intersect_count(a, b)`: |distinct(a) ∩ distinct(b)| for two
  * string arrays — exactly `size(array_intersect(a, b))` for null-free
  * arrays, without materializing the intersection array per row-pair
  * (which matters when the dedup verify stage scores millions of
  * candidate pairs: the whole row's work is this one expression). The
  * kernel builds one hash set from the right array and REMOVES each
  * matched left element as it counts, so duplicate elements on either
  * side count once — set semantics on arbitrary inputs, not just the
  * pre-distincted shingle sets the verify stage feeds it. Null elements
  * are ignored (the Catalyst rewrite rule in graft.functions.Rewrites
  * therefore only fires on containsNull=false schemas).
  *
  * Same preference order as ArrayDotLong (SURVEY.md §2): compose
  * built-ins first; reach for a native `Expression` with `doGenCode` when
  * the composed form allocates in the hot loop.
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[UTF8String](y.numElements() * 2)
    var i = 0
    while (i < y.numElements()) {
      if (!y.isNullAt(i)) set.add(y.getUTF8String(i))
      i += 1
    }
    var c = 0L
    i = 0
    while (i < x.numElements()) {
      // remove-on-match: duplicates in x count once, set dedups y
      if (!x.isNullAt(i) && set.remove(x.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val set = ctx.freshName("set")
      s"""
         |java.util.HashSet<Object> $set =
         |  new java.util.HashSet<Object>($b.numElements() * 2);
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  if (!$b.isNullAt($j)) $set.add($b.getUTF8String($j));
         |}
         |long $c = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $set.remove($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}
