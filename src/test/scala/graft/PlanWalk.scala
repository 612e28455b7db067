package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** AQE wrappers (AdaptiveSparkPlanExec, QueryStageExec) are opaque to
  * SparkPlan.collect() — this walker descends through them so plan
  * assertions see the real executed operators. */
object PlanWalk {
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: through.flatMap(allNodes)
  }
}
