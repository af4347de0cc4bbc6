package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.AsciiCleanLower

/** Optimizer rule for the engine's native expression — the
  * `Rule[LogicalPlan]` extension point (SURVEY §4.1: Catalyst's stock
  * rules don't know user expressions, so algebraic identities of native
  * functions need their own rule):
  *
  *   - `ascii_clean_lower(ascii_clean_lower(x))` → one application
  *     (idempotent: output is already clean lowercase ASCII);
  *   - `lower(ascii_clean_lower(x))` → `ascii_clean_lower(x)`
  *     (`lower` is the identity on clean output).
  *
  * Note the unsound-looking sibling `ascii_clean_lower(lower(x))` is NOT
  * rewritten: Unicode one-to-ASCII lowercase mappings (U+0130 → "i̇")
  * mean `lower` can INTRODUCE ASCII letters, so dropping it would change
  * results.
  *
  * Injected by GraftExtensions; usable ad hoc via
  * `spark.experimental.extraOptimizations`.
  */
object SimplifyAsciiCleanLower extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case AsciiCleanLower(inner @ AsciiCleanLower(_)) => inner
      case Lower(inner @ AsciiCleanLower(_)) => inner
    }
}
