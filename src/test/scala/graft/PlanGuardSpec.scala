package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-shape guard rails over EVERY plan any registered query executes:
  * catches the class of scale regression where a refactor silently turns
  * an equi-join into an all-pairs product. Inspecting only the returned
  * frame's plan would be blind to iterative queries — their inner rounds
  * execute during `run()` and the returned frame is a lineage-truncated
  * leaf — so a QueryExecutionListener captures every executed plan,
  * including each propagation/Lloyd round's. Broadcast nested-loop joins
  * over literal/tiny frames are legitimate (`crossJoin(broadcast(...))`
  * on counts/centers); an unbroadcast CartesianProduct never is.
  */
class PlanGuardSpec extends SparkSpec {

  test("no executed plan of any registered query contains an unbroadcast cartesian product") {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.allQueries.foreach { q =>
        try q.run(spark, sf).count()
        finally CacheRegistry.clear()
      }
      // listener callbacks arrive via the async listener bus — wait for
      // the captured-plan count to go quiet before asserting
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(300)
        if (plans.size == last) stable += 1 else { stable = 0; last = plans.size }
      }
      assert(plans.size >= SparkEntry.allQueries.size, "listener captured too few plans")
      plans.forEach { p =>
        assert(!p.contains("CartesianProduct"),
          s"an executed plan contains a CartesianProduct — an all-pairs join reached the planner:\n${p.take(2000)}")
      }
    } finally spark.listenerManager.unregister(listener)
  }
}
