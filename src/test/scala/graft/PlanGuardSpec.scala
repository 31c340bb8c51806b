package graft

/** Plan-shape guard rails over EVERY registered query: catches the class
  * of scale regression where a refactor silently turns an equi-join into
  * an all-pairs product. Broadcast nested-loop joins over literal/tiny
  * frames are legitimate (`crossJoin(broadcast(...))` on counts/centers);
  * an unbroadcast CartesianProduct never is.
  */
class PlanGuardSpec extends SparkSpec {

  test("no registered query plans an unbroadcast cartesian product") {
    SparkEntry.allQueries.foreach { q =>
      try {
        val plan = q.run(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"${q.name} plans a CartesianProduct — an all-pairs join reached the planner")
      } finally CacheRegistry.clear()
    }
  }
}
