package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArraySort, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.SetJaccard

/** Optimizer rule: when both inputs of a hash-set [[SetJaccard]] are
  * provably sorted and distinct (an `array_sort(array_distinct(...))`
  * subtree), swap in the allocation-free merge-walk kernel. Users who
  * build token sets inline get the ~2× pairwise kernel without knowing
  * the sorted variant exists; values are bit-identical by construction,
  * so the rewrite is always safe.
  *
  * This is the (c) rung of the custom-operator ladder (a Catalyst
  * `Rule[LogicalPlan]` registered via `SparkSessionExtensions`) applied
  * where it genuinely pays: a kernel-selection decision the analyzer
  * can prove but a user shouldn't have to.
  */
object SortedKernelRule extends Rule[LogicalPlan] {

  /** Conservatively: sorted+distinct iff the expression IS
    * array_sort(array_distinct(_)) (default ascending comparator).
    */
  private def sortedDistinct(e: Expression): Boolean = e match {
    case ArraySort(ArrayDistinct(_), _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case j @ SetJaccard(l, r, false)
          if sortedDistinct(l) && sortedDistinct(r) =>
        j.copy(assumeSorted = true)
    }
}
