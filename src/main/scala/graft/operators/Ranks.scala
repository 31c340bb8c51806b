package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking helpers.
  *
  * `ntile(k) OVER (ORDER BY ...)` with no PARTITION BY funnels the whole
  * input through ONE task (Catalyst plans a SinglePartition exchange) —
  * correct, but a serial bottleneck once the ranked set is itself large
  * (a per-customer rollup at 100 TB is billions of rows). The two-pass
  * form here keeps the exact SQL-standard ntile semantics (first n%k
  * buckets get one extra row) with no all-rows-on-one-task stage:
  *
  *   1. range-repartition by the sort key and PERSIST the result (via
  *      [[graft.CacheRegistry]], so harnesses release it per-query).
  *      The persist is load-bearing for correctness, not a perf knob:
  *      range boundaries come from runtime SAMPLING, and the offsets
  *      branch below is column-pruned differently from the data branch,
  *      so Catalyst plans TWO non-canonically-equal range exchanges that
  *      ReuseExchange cannot dedupe — each would sample its own
  *      boundaries and the per-range offsets would misalign (observed:
  *      11 "deciles" from ntile(10)). Caching pins one materialized
  *      partition assignment that both consumers read;
  *   2. a P-row side frame (P = shuffle partitions) of per-range counts
  *      → exclusive prefix offsets; the only single-partition window
  *      runs over those P rows, never the data;
  *   3. broadcast the offsets back; per-range row_number + offset =
  *      exact global rank; then the closed-form ntile bucket from
  *      (rank, N, k).
  *
  * One range exchange + one cache materialization + one hash exchange on
  * the range id replace the serial single-partition sort — every
  * data-bearing stage stays parallel at any scale. At 100 TB the cache
  * is a deliberate MEMORY_AND_DISK staging of the ranked set (the same
  * materialize-at-the-boundary lever the composed pipeline uses), priced
  * far below the single-task sort it removes.
  */
object Ranks {

  /** Adds `out` = exact ntile(k) under the total order `sort` (callers
    * must include a unique tiebreaker so the order is total). Matches
    * `ntile(k).over(Window.orderBy(sort: _*))` row-for-row.
    */
  def distNtile(df: DataFrame, k: Int, out: String, sort: Column*): DataFrame = {
    require(k > 0, "ntile bucket count must be positive")
    // no explicit partition count: an explicit N exempts the exchange
    // from AQE, pinning e.g. 2048 near-empty ranges over a rollup in the
    // production-partition rehearsal (measured 16.9 s for
    // customer_deciles at sf0.1/2048). Without it AQE coalesces ADJACENT
    // range partitions to data-proportional sizes — adjacency keeps
    // pid order ≡ range order, which is all the prefix-offset pass needs,
    // and the persist still pins ONE materialized assignment for both
    // consumers.
    val ranged = graft.CacheRegistry.persist(
      df.repartitionByRange(sort: _*)
        .withColumn("__nt_pid", spark_partition_id()))
    val offs = ranged.groupBy(col("__nt_pid"))
      .agg(count(lit(1)).as("__nt_cnt"))
      .withColumn("__nt_off", coalesce(
        sum(col("__nt_cnt")).over(Window.orderBy(col("__nt_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nt_n",
        sum(col("__nt_cnt")).over(Window.orderBy(col("__nt_pid"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__nt_pid"), col("__nt_off"), col("__nt_n"))
    // SQL ntile: q = N DIV k, r = N % k; the first r buckets hold q+1
    // rows. rank <= r*(q+1)  ->  ceil(rank/(q+1)); else r + ceil((rank -
    // r*(q+1))/q). greatest(q,1) guards the q=0 branch, which is
    // unreachable (rank <= N = r*(q+1) when q=0) but keeps eval safe.
    ranged
      .join(broadcast(offs), "__nt_pid")
      .withColumn("__nt_rn",
        row_number().over(
          Window.partitionBy(col("__nt_pid")).orderBy(sort: _*))
          .cast("long") + col("__nt_off"))
      .withColumn(out, expr(
        s"""CAST(CASE
           |  WHEN __nt_rn <= (__nt_n % $k) * (__nt_n DIV $k + 1)
           |    THEN (__nt_rn + __nt_n DIV $k) DIV (__nt_n DIV $k + 1)
           |  ELSE (__nt_n % $k)
           |    + (__nt_rn - (__nt_n % $k) * (__nt_n DIV $k + 1)
           |       + __nt_n DIV $k - 1) DIV greatest(__nt_n DIV $k, 1)
           |END AS INT)""".stripMargin))
      .drop("__nt_pid", "__nt_off", "__nt_n", "__nt_rn")
  }
}
