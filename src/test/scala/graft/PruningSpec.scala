package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scan-level efficiency contracts: filters and projections must reach the
  * parquet scan (predicate pushdown, column pruning) and a day-partitioned
  * layout must prune partitions — the properties every 100 TB query in
  * this library leans on, asserted mechanically on the executed plans.
  */
class PruningSpec extends SparkSpec {

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec => f }
  }

  test("equality predicate is pushed down to the parquet scan") {
    val df = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") === 1L)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = scans(df).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(l_orderkey,1)"), pushed)
  }

  test("a two-column projection prunes the read schema to those columns") {
    val df = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = scans(df).head
    val readSchema = scan.metadata("ReadSchema")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"),
      readSchema)
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"projection did not prune: $readSchema")
  }

  test("day-partitioned layout prunes partitions under a day filter") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    Tables.load(spark, sf, "events")
      .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val days = spark.read.parquet(dir).select("day").distinct().count()
    assert(days > 1, "fixture must span multiple days for pruning to matter")

    val df = spark.read.parquet(dir).filter(col("day") === "2024-01-03")
    val scan = scans(df).head
    // the day predicate must be a partition filter, not a data filter
    assert(scan.partitionFilters.exists(_.toString.contains("2024-01-03")),
      s"day filter not applied at partition level: ${scan.partitionFilters}")
    assert(!scan.metadata("PushedFilters").contains("day"),
      "day filter leaked into data filters — partition column misread")
    // and the scan must actually read ONE partition's files
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    val prunedRows = df.count()
    val fullRows = spark.read.parquet(dir).count()
    assert(prunedRows > 0 && prunedRows < fullRows / 10,
      s"pruned=$prunedRows full=$fullRows — not a single-day slice")
  }
}
