package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Cast, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Optimizer rewrites for the engine's native kernels.
  *
  * `size(array_intersect(a, b))` — the natural way to write an overlap
  * count — materializes the intersection ARRAY per row only to take its
  * length. On the dedup verify path that is millions of candidate pairs
  * allocating an array each. [[IntersectCountRewrite]] swaps in the
  * codegen'd [[ArrayIntersectCount]] kernel (one hash set, remove-on-
  * match counting, zero allocation), so a user writing the built-in
  * composition gets the native kernel automatically.
  *
  * Soundness guards — the rewrite fires only when the forms are
  * bit-equivalent:
  *   - both inputs are `array<string>` with `containsNull = false`
  *     (array_intersect propagates a common NULL element into the
  *     result, which the kernel deliberately ignores);
  *   - `size` is in non-legacy mode (legacy `size(NULL) = -1`; the
  *     kernel is null-propagating like non-legacy size).
  * Duplicate elements are safe with no guard: array_intersect dedups
  * its output, and the kernel's remove-on-match counts each distinct
  * common element once.
  *
  * Injected by [[GraftExtensions]] (cluster path) and appended to
  * `spark.experimental.extraOptimizations` by
  * `GraftFunctions.register` (library-embedding path).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def nullFreeStrings(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(StringType, containsNull) => !containsNull
      case _                                   => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), legacySizeOfNull)
          if !legacySizeOfNull && nullFreeStrings(a) && nullFreeStrings(b) =>
        // size() is IntegerType; the cast preserves the plan's schema
        // (the count is bounded by the input array length, so the
        // narrowing can never overflow)
        Cast(ArrayIntersectCount(a, b), IntegerType)
    }
}
