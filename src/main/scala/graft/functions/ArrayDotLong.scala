package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** `array_dot_long(a, b)`: exact int64 dot product of two bigint arrays —
  * the hot kernel of the engine's quantized vector math (PipeData's
  * fixed-point cosine). A native Catalyst expression with `doGenCode`:
  * the generated tight primitive loop stays inside whole-stage codegen,
  * where the equivalent `aggregate(zip_with(...))` higher-order chain
  * falls back to interpreted lambda evaluation and allocates an
  * intermediate array per row-pair. Same preference order the engine
  * follows everywhere (SURVEY.md §2: compose built-ins > custom
  * Expression > mapPartitions).
  *
  * Overflow: inputs are 1e-6-quantized unit-scale vectors (|x| ≲ 2^22),
  * so 64-dim products sum well inside int64 — same contract the SQL/
  * oracle formulation relies on.
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private val fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot_long"),
      new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
      (args: Seq[Expression]) => ArrayDotLong(args(0), args(1))),
    (FunctionIdentifier("array_intersect_count"),
      new ExpressionInfo(classOf[ArrayIntersectCount].getName, "array_intersect_count"),
      (args: Seq[Expression]) => ArrayIntersectCount(args(0), args(1))),
    // Spark's own runtime-filter predicate, exposed as a callable
    // function: args = (serialized util.sketch.BloomFilter literal,
    // xxhash64 of the tested value). The same codegen'd membership test
    // InjectRuntimeFilter plants — here built EXPLICITLY over a chosen
    // key set (e.g. benchmark shingles) so the corpus-side scan drops
    // non-candidates before any join. Spark ships no public SQL surface
    // for it (might_contain is internal), hence the registration.
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))))

  /** Idempotent per-session registration (library embedding path). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
    // post-hoc sessions can't inject optimizer rules; experimental
    // optimizations run as a final batch, which is all the rewrite needs
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(IntersectCountRewrite))
      spark.experimental.extraOptimizations = extra :+ IntersectCountRewrite
  }

  /** Builder for `spark.sql.extensions=graft.functions.GraftExtensions`
    * (cluster deployment path). */
  def inject(e: SparkSessionExtensions): Unit = {
    fns.foreach { case (id, info, builder) =>
      e.injectFunction((id, info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => IntersectCountRewrite)
  }
}

/** Entry point for `spark.sql.extensions`: the engine's native functions
  * (array_dot_long, array_intersect_count), the size∘array_intersect →
  * native-kernel optimizer rewrite, and the as-of join planner strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
