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

  test("distNtileScores: N scores in ONE range exchange — exact vs window ntile, fixed persist budget") {
    val df = fixture(10007)
      .withColumn("w", pmod(hash(col("id"), lit(7)), lit(53)).cast("long"))
    val specs = Seq(
      Ranks.NtileSpec("a", col("v"), asc = true),
      Ranks.NtileSpec("b", col("v"), asc = false),
      Ranks.NtileSpec("c", col("w"), asc = false, carryAs = Some("w_raw")))
    CacheRegistry.clear()
    val got = Ranks.distNtileScores(df, "id", 5, specs)
    try {
      got.collect()
      // correctness: row-for-row identical to three chained window ntiles
      // (descending specs = ORDER BY value DESC, key — the negation trick
      // must not disturb tie-breaking), and the carried raw value must
      // round-trip through the negation exactly
      val expect = specs.foldLeft(df) { case (acc, s) =>
        val lead = if (s.asc) s.value else s.value.desc
        acc.withColumn(s.out, ntile(5).over(Window.orderBy(lead, col("id"))))
      }
      val mismatches = expect.alias("e").join(got.alias("g"), Seq("id"))
        .filter(col("e.a") =!= col("g.a") || col("e.b") =!= col("g.b") ||
          col("e.c") =!= col("g.c") || col("e.w") =!= col("g.w_raw"))
        .count()
      assert(mismatches == 0, s"$mismatches score mismatches")
      // persist budget is FIXED in the score count: one wide base + one
      // slim tagged ranging, however many scores. A chained composition
      // registers one full-width (and growing) persist per score — the
      // rfm_segments regression shape.
      val schemas = CacheRegistry.registeredSchemas
      assert(schemas.size == 2,
        s"persist budget blown: ${schemas.size} persists, expected 2 — $schemas")
      assert(schemas.head.toSet == Set("id", "v", "w"),
        s"first persist must be the base: ${schemas.head}")
      assert(got.columns.toSet == Set("id", "a", "b", "c", "w_raw"),
        s"result must be key + scores + carried values only: ${got.columns.toSeq}")
      assert(schemas(1).toSet ==
        Set("__nt_tag", "__nt_v", "__nt_key", "__nt_pid"),
        s"second persist must be the slim tagged ranging: ${schemas(1)}")
    } finally CacheRegistry.clear()
  }

  test("distNtileScores: single spec and tiny frames match window ntile") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 1L)).toDF("id", "v")
    CacheRegistry.clear()
    val got = Ranks.distNtileScores(df, "id", 10,
      Seq(Ranks.NtileSpec("b", col("v"), asc = false)))
    try {
      val expect = df.withColumn("b",
        ntile(10).over(Window.orderBy(col("v").desc, col("id"))))
      val bad = expect.alias("e").join(got.alias("g"), Seq("id"))
        .filter(col("e.b") =!= col("g.b")).count()
      assert(bad == 0)
    } finally CacheRegistry.clear()
  }
}
