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

  test("funnel is array-free: no collect_list anywhere in the plan") {
    val df = SparkEntry.queries("funnel_conversion")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"),
      "funnel must use the chained conditional-min window form")
    assert(!plan.contains("sort_array"))
    CacheRegistry.clear()
  }

  test("funnel whale key completes under a forced-spill window buffer") {
    // 100×-hot-key micro-fixture: one user owns ~100× the events of the
    // rest of the population. With the window buffer spill threshold
    // forced down to 64 rows, WindowExec must spill the whale partition
    // to disk — the old collect_list form had no such relief valve (its
    // aggregation buffer held the whole key's array in memory). Passing
    // here under the same per-stage values as a tiny-threshold-free run
    // proves per-task memory is bounded by the spill threshold, not the
    // key width.
    import spark.implicits._
    val H = 3600L * 1000 * 1000 * 1000
    val whale = (0 until 20000).map { i =>
      (1L, 1 + i % 3, (i / 3) * H / 1000 + (i % 3) + 1)
    }
    val rest = (0 until 200).map { i =>
      (2L + i % 50, 1 + i % 3, (i / 3) * H + (i % 3) + 1)
    }
    val ev = (whale ++ rest).toDF("user_id", "stage", "tsn")
      .repartition(4, org.apache.spark.sql.functions.col("user_id"))
    val key = "spark.sql.windowExec.buffer.spill.threshold"
    val prior = spark.conf.getOption(key)
    try {
      val expected = graft.operators.Behavior.funnelTimes(ev).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
      spark.conf.set(key, "64")
      val spilled = graft.operators.Behavior.funnelTimes(ev).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
      assert(spilled === expected)
      assert(spilled(1L)._3.isDefined) // the whale user completes the funnel
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
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
