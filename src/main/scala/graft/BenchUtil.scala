package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Shared plumbing for the measurement mains (SkewBench/SketchBench):
  * wall-clock timing and SQL-metric extraction from EXECUTED plans, so
  * a bench observes a quantity from the run it times instead of paying
  * for a second run to count it. */
private[graft] object BenchUtil {

  def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Every node of an executed plan, descending through the adaptive
    * wrappers: `AdaptiveSparkPlanExec` exposes the final plan, and
    * `QueryStageExec` nodes are LEAVES to TreeNode.collect (their
    * materialized sub-plan hangs off `.plan`, not `.children`), so a
    * plain collect over an AQE plan silently misses every node inside
    * completed stages. */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    root.collect { case n => n }.flatMap {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case other => Seq(other)
    }
  }

  /** Sum `key` over every node whose name contains `nodeSubstr`. */
  def metricSum(plan: SparkPlan, nodeSubstr: String, key: String): Long =
    allNodes(plan).filter(_.nodeName.contains(nodeSubstr))
      .flatMap(_.metrics.get(key).map(_.value)).sum

  /** Max of `key` over every node matching `pred` — for quantities
    * where one node dominates (e.g. the candidate join's numOutputRows
    * in a similarity-join plan). Callers pick nodes via nodeName and,
    * when a plan holds several nodes of one kind, via simpleString
    * details (join type etc.). */
  def metricMaxWhere(plan: SparkPlan, key: String)(pred: SparkPlan => Boolean): Long = {
    val vs = allNodes(plan).filter(pred)
      .flatMap(_.metrics.get(key).map(_.value))
    if (vs.isEmpty) 0L else vs.max
  }
}
