package graft.plans

import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.WordShingles

/** graft's Catalyst optimizer rules (injected by GraftExtensions or
  * GraftFunctions.register).
  */

/** `array_distinct(graft_word_shingles(x, k))` == `graft_word_shingles(x, k)`
  * — the expression already emits distinct shingles, so a user-composed
  * array_distinct is a per-row O(n) no-op walk. Idempotence collapse.
  */
object CollapseDistinctShingles extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayDistinct(ws: WordShingles) => ws
    }
}
