package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape pins for the retrieval and curation families: the scaladoc
  * claims ("broadcast 3-term semi-join", "map-only cosine branch",
  * "TakeOrderedAndProject, no global sort") asserted mechanically, so a
  * refactor that silently turns a broadcast decision join into a
  * sort-merge shuffle fails HERE instead of surfacing as a 100 TB
  * slowdown.
  */
class RetrievalPlanSpec extends SparkSpec {

  private def executed(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.count()
    df.queryExecution.executedPlan
  }

  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case e => Seq(e)
    }.flatten

  test("search_bm25: the query-term join broadcasts, top-k is TakeOrdered") {
    try {
      val plan = executed("search_bm25")
      val nodes = unwrap(plan)
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "the 3-term query must reach tf as a broadcast join")
      assert(nodes.exists(_.getClass.getSimpleName.contains("TakeOrderedAndProject")),
        "top-20 must be TakeOrderedAndProject, not a global sort")
    } finally CacheRegistry.clear()
  }

  test("search_phrase: no sort-merge join and no cartesian on the corpus side") {
    try {
      val plan = executed("search_phrase")
      val names = unwrap(plan).map(_.getClass.getSimpleName)
      assert(!names.exists(_.contains("CartesianProduct")),
        "the one-row query frame must broadcast, never cartesian")
    } finally CacheRegistry.clear()
  }

  test("cluster_balance_sample: the rate join broadcasts, bounded exchanges") {
    try {
      val plan = executed("cluster_balance_sample")
      val nodes = unwrap(plan)
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "the K-row rate table must broadcast into the keep decision")
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 6,
        s"balance pass grew a new data-wide shuffle: $shuffles exchanges")
    } finally CacheRegistry.clear()
  }

  test("corpus_divergence: totals broadcast; only the fine-key aggregations shuffle") {
    try {
      val plan = executed("corpus_divergence")
      val nodes = unwrap(plan)
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "per-source totals must broadcast into the term scores")
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles <= 6,
        s"divergence grew a new data-wide shuffle: $shuffles exchanges")
    } finally CacheRegistry.clear()
  }

  test("search_bm25_multi: the panel broadcasts, no sort-merge join") {
    try {
      val plan = executed("search_bm25_multi")
      val nodes = unwrap(plan)
      val names = nodes.map(_.getClass.getSimpleName)
      assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "the (qid, token) panel must reach the postings as a broadcast join")
      assert(!names.exists(_.contains("SortMergeJoin")),
        "no corpus-side sort-merge join in the panel scorer")
      assert(!names.exists(_.contains("CartesianProduct")),
        "stats must broadcast, never cartesian")
    } finally CacheRegistry.clear()
  }

  test("search_snippets: winners prune the corpus scan via broadcast, no cartesian") {
    try {
      val plan = executed("search_snippets")
      val names = unwrap(plan).map(_.getClass.getSimpleName)
      assert(!names.exists(_.contains("SortMergeJoin")),
        "the 5-winner and anchor frames must broadcast into the position pass")
      assert(!names.exists(_.contains("CartesianProduct")),
        "no cartesian anywhere in the snippet assembly")
    } finally CacheRegistry.clear()
  }

  test("vocab_growth: one token-keyed shuffle beyond the shared tf derivation") {
    try {
      val plan = executed("vocab_growth")
      val nodes = unwrap(plan)
      val names = nodes.map(_.getClass.getSimpleName)
      assert(!names.exists(_.contains("SortMergeJoin")),
        "the 10-row decile frames must broadcast-join, never sort-merge")
      assert(!names.exists(_.contains("CartesianProduct")),
        "the bounds row must BROADCAST-nested-loop in, never CartesianProduct")
    } finally CacheRegistry.clear()
  }
}
