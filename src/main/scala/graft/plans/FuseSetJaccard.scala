package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArrayUnion, Cast, Divide, EvalMode, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.SetJaccard

/** Optimizer rule (injected via GraftExtensions): rewrite the
  * declarative Jaccard idiom
  * {{{
  *   size(array_intersect(a, b)) / size(array_union(a, b))   -- as doubles
  * }}}
  * into the fused one-pass [[SetJaccard]] kernel. Users keep writing
  * the composable built-in form (Column API or SQL — the rule sees the
  * analyzed plan, so both surfaces benefit); the plan executes one
  * hash pass per side with no intermediate intersect/union ARRAYS
  * materialized-then-discarded. This is the Spark-first division of
  * labor the engine is built on: semantics stay declarative, and a
  * custom Expression appears only where the built-in composition pays
  * measurable overhead (JaccardFuseSpec holds the equivalence
  * property; the n03/s19 verify stage is the production beneficiary).
  *
  * Guards: element type String (UTF8String equality is total — no
  * float -0.0/NaN set-equality subtleties), `legacySizeOfNull = false`
  * on both sizes (the legacy flag maps size(null) to −1, which the
  * fused null-propagating kernel deliberately does not reproduce), and
  * the two set-op argument pairs must be the same two arrays (either
  * order — intersect and union are symmetric).
  */
object FuseSetJaccard extends Rule[LogicalPlan] {

  private def stringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def samePair(a1: Expression, b1: Expression,
      a2: Expression, b2: Expression): Boolean =
    (a1.semanticEquals(a2) && b1.semanticEquals(b2)) ||
      (a1.semanticEquals(b2) && b1.semanticEquals(a2))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // LEGACY divide = NULL on a zero divisor (DivModLike null-guards
    // before the IEEE op); ANSI throws DIVIDE_BY_ZERO on an empty
    // union — the kernel reproduces whichever mode it replaces. TRY
    // mode (null-on-error) is deliberately NOT fused.
    // (Spark 4.1 wraps the mode in NumericEvalContext — match through.)
    case Divide(
        Cast(Size(ArrayIntersect(a1, b1), false), DoubleType, _, _),
        Cast(Size(ArrayUnion(a2, b2), false), DoubleType, _, _), ctx)
        if ctx.evalMode != EvalMode.TRY &&
          stringArray(a1) && stringArray(b1) && samePair(a1, b1, a2, b2) =>
      SetJaccard(a1, b1, failOnDivideByZero = ctx.evalMode == EvalMode.ANSI)
  }
}
