package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Full recursive walk over an EXECUTED plan, crossing the node kinds
  * `children` alone does not: AQE's final plan (AdaptiveSparkPlanExec),
  * materialized query stages, reused exchanges (whose child is the
  * ORIGINAL exchange subtree — the same object, so reference-level
  * dedup downstream sees through stage reuse), cached-relation bodies,
  * and subquery plans. Shared by the plan-object pins (PlanSpec join-key
  * asserts, StageReuseSpec scan counting) that replaced string matching
  * on plan text (r19 advice: string pins go vacuous under renames).
  */
object PlanWalk {
  def all(p: SparkPlan): Seq[SparkPlan] = {
    val kids = (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case o                        => o.children
    }) ++ p.subqueries
    p +: kids.flatMap(all)
  }
}
