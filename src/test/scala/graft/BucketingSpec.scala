package graft

import graft.operators.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bucketed co-located join produces a shuffle-free plan and the same
  * rows as the plain join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders⋈lineitem joins with zero shuffle exchanges") {
    val o = Tables.load(spark, sf, "orders")
    val l = Tables.load(spark, sf, "lineitem")
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "b_lineitem", "l_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // report per-bucket sort order from the scan (valid: 1 file per bucket)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = Bucketing.cocoJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      val n = joined.count() // executes; AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n$plan")
      // both sides are bucket-sorted, so no explicit sorts either
      val sorts = plan.collect { case s: SortExec => s }
      assert(sorts.isEmpty, "expected sort-free join from sorted buckets")
      val plainCount = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      assert(n == plainCount)
    } finally {
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
