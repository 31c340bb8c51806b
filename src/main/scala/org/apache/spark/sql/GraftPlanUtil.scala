package org.apache.spark.sql

/** Plan-surgery helpers that need `private[sql]` access — placed in the
  * Spark SQL package for that reason only; everything used is plain
  * Apache Spark API (`QueryExecution.toRdd`,
  * `SparkSession.internalCreateDataFrame`).
  */
object GraftPlanUtil {

  /** Cut `df`'s lineage to a `LogicalRDD` leaf WITHOUT leaving Spark's
    * internal row format. `createDataFrame(df.rdd, schema)` — the stock
    * plan-truncation move — converts every row to an external
    * [[org.apache.spark.sql.Row]] on the way out and back to an
    * `InternalRow` on every read of the result, a double conversion that
    * dominates iterative algorithms which cut their plan once per round
    * (the measured cost lives in `CacheRegistry.materialize`, this
    * method's only caller). Here the physical plan's own
    * `RDD[InternalRow]` backs the new leaf directly; the per-partition
    * `copy()` is required because operators reuse mutable `UnsafeRow`
    * buffers across rows.
    *
    * The result is LAZY (same contract as the `df.rdd` form): callers
    * persist + count it to materialize.
    */
  def cutLineage(df: Dataset[Row]): Dataset[Row] = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cdf.queryExecution.toRdd.map(_.copy())
    cdf.sparkSession.internalCreateDataFrame(rdd, cdf.schema)
  }
}
