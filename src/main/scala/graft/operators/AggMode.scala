package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}

/** The exact-vs-approximate distinct switch (SURVEY §7.4): the reference
  * keeps exact per-window order-id sets (HashSet union), which this engine
  * matches by default — and which the DuckDB oracle verifies. At 100 TB the
  * exact distinct shuffle becomes the bottleneck; setting
  * `spark.graft.approxDistinct=true` on the session swaps every distinct
  * counter for HyperLogLog++ (`approx_count_distinct`) without touching
  * query code. Correctness mode stays the default so the oracle gate always
  * runs exact.
  */
object AggMode {
  val Flag = "spark.graft.approxDistinct"

  /** Same contract for percentiles: `spark.graft.approxPercentile=true`
    * swaps the exact two-pass positional selection for the
    * `percentile_approx` GK sketch (single aggregation, mergeable state)
    * without touching query code — see `Relevance.percentiles`.
    */
  val PercentileFlag = "spark.graft.approxPercentile"

  def distinctCount(spark: SparkSession, c: Column): Column =
    if (spark.conf.getOption(Flag).exists(_.toBoolean)) approx_count_distinct(c)
    else countDistinct(c)

  /** Whether the session is in approx-distinct mode — for call sites whose
    * EXACT form is not a `countDistinct` (e.g. a count over an
    * already-distinct frame) and that therefore branch on the flag rather
    * than swap the aggregate.
    */
  def approxDistinct(spark: SparkSession): Boolean =
    spark.conf.getOption(Flag).exists(_.toBoolean)

  def approxPercentiles(spark: SparkSession): Boolean =
    spark.conf.getOption(PercentileFlag).exists(_.toBoolean)
}
