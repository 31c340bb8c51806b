package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end streaming topology demo — the reference's app chain as live
  * Structured Streaming queries over file-staged topics:
  *
  * ```
  *   stage/events/   (ODS topic)  ──▶ visitor-stats 10 s windows ──▶ out/dws_visitor_stats/
  *   stage/cdc/      (ODS topic)  ──▶ config-routed               ──▶ out/kafka/<table>/ + out/dim/<table>/
  * ```
  *
  * Usage: `sbt "runMain graft.streaming.Demo <sfDir> <workDir>"` — stages
  * the testdata as the source "topics", runs both queries with
  * `availableNow` triggers and real checkpoints (the reference had
  * checkpointing commented out; here it is on), prints row counts.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val work = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_demo").toString
    val spark = GraftSession.getOrCreate("graft-demo")
    import java.nio.file.{Files, Paths}

    // stage the ODS "topics"
    val eventsDir = s"$work/stage/events"
    Files.createDirectories(Paths.get(eventsDir))
    Files.copy(Paths.get(s"$sfDir/events.parquet"), Paths.get(s"$eventsDir/part-0.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    // DWS: visitor stats over the event stream (11 s watermark, 10 s tumble)
    val vs = Pipelines.visitorStatsStream(Pipelines.eventsStream(spark, eventsDir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt/visitor_stats")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$work/out/dws_visitor_stats")
      .start()

    // DWS: per-sku product stats over the detail stream
    val liDir = s"$work/stage/lineitem"
    Files.createDirectories(Paths.get(liDir))
    Files.copy(Paths.get(s"$sfDir/lineitem.parquet"), Paths.get(s"$liDir/part-0.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val liSchema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
    val ps = Pipelines.productStatsStream(
        spark.readStream.schema(liSchema).parquet(liDir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$work/ckpt/product_stats")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", s"$work/out/dws_product_stats")
      .start()

    // DWD/DIM: CDC envelope stream routed by the config table
    val cdc = graft.operators.CdcRoute.envelope(spark, sfDir)
    val cfg = graft.operators.CdcRoute.config(spark)
      .withColumn("sink_pk", lit("id"))
    val cdcDir = s"$work/stage/cdc"
    cdc.write.mode("overwrite").parquet(cdcDir)
    val route = spark.readStream
      .schema(spark.read.parquet(cdcDir).schema).parquet(cdcDir)
      .writeStream
      .option("checkpointLocation", s"$work/ckpt/cdc")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Pipelines.routeCdcBatch(batch, batchId, cfg, s"$work/out")
      }
      .start()

    vs.awaitTermination()
    ps.awaitTermination()
    route.awaitTermination()

    val vsOut = spark.read.parquet(s"$work/out/dws_visitor_stats")
    val psOut = spark.read.parquet(s"$work/out/dws_product_stats")
    val kafkaOut = spark.read.parquet(s"$work/out/kafka/dwd_order_info")
    val dimOut = Pipelines.readDim(spark, s"$work/out", "dim_order_info").get
    println(s"DEMO_RESULT visitor_stats_windows=${vsOut.count()} " +
      s"product_stats_rows=${psOut.count()} " +
      s"dwd_order_info=${kafkaOut.count()} dim_order_info=${dimOut.count()} workDir=$work")
    spark.stop()
  }
}
