package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** T6: checkpointed restart gives exactly-once file-sink output — the
  * semantics the reference configured but left commented out
  * (`RT/app/dwd/BaseLogApp.java:28-34`), active here by construction.
  * A query runs over staged input, stops, more input arrives, and a new
  * query instance resumes from the same checkpoint: every input row lands
  * in the sink exactly once.
  */
class CheckpointSpec extends SparkSpec {

  test("restart from checkpoint is exactly-once into the parquet sink") {
    val work = java.nio.file.Files.createTempDirectory("ckptspec").toString
    val in = s"$work/in"; val out = s"$work/out"; val ckpt = s"$work/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    val events = Tables.load(spark, sf, "events").select("event_id", "ts_ns", "user_id")
    val half = events.count() / 2

    // stage a batch as a single flat file inside `in` (file source does not
    // recurse into written _temporary dirs)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$work/stage_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    stage(events.filter(col("event_id") < half), "batch1")

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(events.schema)
        .parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce() // first launch: half the data

    stage(events.filter(col("event_id") >= half), "batch2")
    runOnce() // second launch resumes from the checkpoint

    val sunk = spark.read.parquet(out)
    assert(sunk.count() == events.count(), "every row exactly once")
    assert(sunk.select("event_id").distinct().count() == events.count(), "no duplicates")
  }
}
