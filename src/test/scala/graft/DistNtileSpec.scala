package graft

import graft.operators.Ranks
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `Ranks.distNtile` must be row-for-row identical to the SQL
  * `ntile(k) OVER (ORDER BY ...)` it replaces, while never funneling the
  * ranked data through a single partition: the only SinglePartition
  * exchange in its plan is the P-row offsets frame, and both consumers
  * (offsets + data) must read the SAME materialized range partitioning
  * — the persist inside distNtile is load-bearing (two independently
  * sampled range exchanges misalign the offsets; observed as 11 buckets
  * from ntile(10) before the cache was added), so the cache scan is
  * pinned here alongside the exact-equality check that would catch a
  * regression.
  */
class DistNtileSpec extends SparkSpec {

  private def fixture(n: Int) = {
    import spark.implicits._
    // deterministic pseudo-random values with ties, unique id tiebreaker
    spark.range(n.toLong).select(col("id"),
      pmod(hash(col("id")), lit(97)).cast("long").as("v"))
  }

  private def check(n: Int, k: Int): Unit = {
    val df = fixture(n)
    val expect = df.withColumn("b",
      ntile(k).over(Window.orderBy(col("v").desc, col("id"))))
    val got = Ranks.distNtile(df, k, "b", col("v").desc, col("id"))
    try {
      val mismatches = expect.alias("e")
        .join(got.alias("g"), Seq("id"))
        .filter(col("e.b") =!= col("g.b"))
        .count()
      assert(mismatches == 0, s"n=$n k=$k: $mismatches rank mismatches")
    } finally CacheRegistry.clear()
  }

  test("distNtile equals window ntile exactly, including the n%k tail") {
    check(10007, 10) // n not divisible by k: first n%k buckets get +1 row
    check(1000, 7)
    check(5, 10)     // fewer rows than buckets: q=0 branch
    check(1, 3)
  }

  test("distNtile plan: both branches read one cached ranging; only the P-row offsets frame is single-partition") {
    val df = fixture(10007)
    val got = Ranks.distNtile(df, 10, "b", col("v").desc, col("id"))
    try {
      got.collect() // materialize THIS QueryExecution so AQE stages exist
      val plan = got.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val planStr = plan.toString
      val cacheScans = planStr.sliding("InMemoryTableScan".length)
        .count(_ == "InMemoryTableScan")
      assert(cacheScans >= 2,
        s"expected offsets AND data branches to scan the cached range " +
          s"partitioning (saw $cacheScans):\n$planStr")
      val singleParts = plan.collectWithSubqueries {
        case s: ShuffleExchangeExec if s.outputPartitioning.numPartitions == 1 => s
      }
      assert(singleParts.size <= 1,
        s"more than one SinglePartition exchange — data is serializing:\n$planStr")
    } finally CacheRegistry.clear()
  }
}
