package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the 100 TB answer to the engine's hottest
  * join (orders ⋈ lineitem on the order key): write both fact tables
  * bucketed AND sorted by the join key, and Spark's scan exposes the
  * bucket partitioning so the sort-merge join needs NO shuffle and NO
  * sort on either side. This is the batch analog of the reference's
  * "parallelism pinned to Kafka partition count" co-location note
  * (`RT/app/dwd/UserJumpDetailApp.java:36`).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). The
    * pre-repartition on the bucket key (same murmur3 hash as bucketing)
    * yields exactly one file per bucket — the condition under which the
    * scan reports per-bucket sort order and the downstream join drops its
    * sorts as well as its shuffles.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts the physical plan is a shuffle-free sort-merge join.
    */
  def cocoJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
