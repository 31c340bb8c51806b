package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Smoke-level invariants over the registered query set (the DuckDB oracle
  * is the authoritative correctness gate; these catch regressions fast).
  * The single execution pass doubles as the plan guard: a
  * QueryExecutionListener captures EVERY plan the queries execute —
  * including iterative queries' inner rounds, whose returned frames are
  * lineage-truncated leaves — and none may contain an unbroadcast
  * CartesianProduct (broadcast nested-loop joins over literal/tiny frames
  * are legitimate; an all-pairs product never is).
  */
class QueriesSpec extends SparkSpec {

  test("every query runs non-empty and no executed plan has a cartesian product") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.allQueries.foreach { q =>
        val n = try q.run(spark, sf).count() finally CacheRegistry.clear()
        assert(n > 0 || Set("dedup_ngram_jaccard", "dedup_embedding_cosine",
          "dedup_minhash_lsh", "dedup_simhash").contains(q.name),
          s"${q.name} returned 0 rows")
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

  test("oracle SQL exists for every query (full correctness coverage)") {
    val missing = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
