package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Exchange-budget pins for the behavior family — the plan shapes
  * PLANS.md reviews, asserted mechanically so a refactor that re-adds
  * e.g. the cohort self-join (which doubled the aggregation subtree)
  * fails here instead of surfacing as a silent slowdown. Budgets carry
  * one exchange of headroom over the reviewed plans where AQE may split
  * a stage; a count above budget means a NEW data-wide shuffle appeared.
  */
class BehaviorPlanSpec extends SparkSpec {

  private def shuffles(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.count()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case e: ShuffleExchangeExec => Seq(e)
      }.flatten
    val plan = df.queryExecution.executedPlan
    val n = unwrap(plan).size
    CacheRegistry.clear()
    n
  }

  test("funnel: one data shuffle + the single-row final aggregation") {
    assert(shuffles("funnel_conversion") <= 2)
  }

  test("cohort retention: no duplicated aggregation subtree") {
    // 1 user_id agg + 1 cells agg + 1 window + 1 sort; the self-join
    // form this replaced measured 8+
    assert(shuffles("cohort_retention") <= 5)
  }

  test("transitions: one window shuffle + tiny grid stages") {
    assert(shuffles("event_transitions") <= 4)
  }

  test("session paths: window + capped assembly + grid + sort") {
    assert(shuffles("session_paths") <= 5)
  }

  test("rolling actives: one distinct shuffle feeding all consumers") {
    // du distinct + wau agg + dau agg + join align + sort
    assert(shuffles("rolling_actives") <= 6)
  }

  test("weekly churn: one window shuffle + weekly grid") {
    assert(shuffles("weekly_churn") <= 5)
  }
}
