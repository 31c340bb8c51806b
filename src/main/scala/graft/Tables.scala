package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Role mapping onto the reference warehouse (FIXTURES.md §4):
  * orders→order_info, lineitem→order_detail, customer→DIM_USER_INFO,
  * nation+region→DIM_BASE_PROVINCE, part→DIM_SKU_INFO snowflake,
  * events→behavior log stream, documents/embeddings→LLM-pipeline extension.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Read one table. `events.ts` is parquet TIMESTAMP(NANOS) which Spark
    * cannot represent; it is read as Long nanos (legacy.parquet.nanosAsLong)
    * and normalized here to a micros `ts` timestamp plus a full-precision
    * `ts_ns` long for deterministic tie-breaking.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftSession.tune(spark)
    val df = spark.read.parquet(path(sfDir, name))
    if (name == "events")
      df.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (names match the DuckDB oracle's). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
