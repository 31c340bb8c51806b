package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew levers for 100 TB keys (SURVEY §7.4): a hot grouping key melts one
  * reducer; salting splits it across `salts` partial groups and
  * re-aggregates. AQE's skew-join handling covers joins; this covers
  * aggregations whose partials are algebraic (sum/count/min/max).
  */
object Salted {

  /** Two-stage salted aggregation: `groupBy(keys :+ salt).agg(partials)`
    * then `groupBy(keys).agg(merge)`. Result is identical to the direct
    * aggregation (sums/counts are associative); the first stage caps any
    * single reducer's share of a hot key at 1/salts.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    // salt = murmur3 of the full row: deterministic under retries and
    // re-partitioning (monotonically_increasing_id is not), spreading a hot
    // key across salts as long as any column varies; fully identical rows
    // share a salt, which only caps the spread, never the correctness
    df.withColumn("_salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).as(s"${valueCol}_sum"), sum(col("_pcnt")).cast("long").as("cnt"))
  }
}
