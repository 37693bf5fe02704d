package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: `size(split(s, ' '))` — the engine's (and plain
  * SQL users') token-count idiom — rewrites to the single-pass
  * [[graft.expr.TokenCountExpr]], skipping the per-row token-array
  * build the generic expression pair pays. Strictly semantics-
  * preserving (null -> null, identical counts for leading/trailing/
  * consecutive separators; property-tested against the original), so
  * every oracle result is unchanged — this is a pure physical-cost
  * rewrite, which is exactly what a `Rule[LogicalPlan]` is for.
  *
  * Fires only on the non-legacy `size` (legacySizeOfNull returns -1
  * for null input, which the replacement does not reproduce) and only
  * on the unlimited single-space split the kernel mirrors.
  *
  * Install via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) or at runtime with
  * `spark.experimental.extraOptimizations`.
  */
object TokenCountRule extends Rule[LogicalPlan] {
  private val Space = UTF8String.fromString(" ")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(p: UTF8String, _), Literal(-1, _)), false)
          if p == Space =>
        graft.expr.TokenCountExpr(str)
    }
}
