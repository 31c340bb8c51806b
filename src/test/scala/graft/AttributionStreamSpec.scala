package graft

import graft.operators.Temporal
import graft.streaming.AttributionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming attribution twin: accumulated per-type credit must equal
  * the one-shot linear split, crediting across batch boundaries within
  * the window, never crediting an evicted touch, and conserving the
  * 10000-bp-per-purchase invariant.
  */
class AttributionStreamSpec extends SparkSpec {

  private val H = 3600000000L // one hour in micros

  // batch 1: touches for users 1 and 2; batch 2 (one hour later): a
  // purchase for user 1 IN window of its batch-1 touch, and a fresh touch
  // + purchase pair for user 2 whose batch-1 touch is beyond the window;
  // batch 3: a purchase for user 2 whose only in-window touch is from
  // batch 2 — by then user 2's batch-1 touch must have been EVICTED
  private val batches = Seq(
    Seq((1L, 1000L, 1L, "view", "", 0.0), (2L, 500L, 2L, "click", "", 0.0)),
    Seq((1L, 2000L + H / 2, 3L, "purchase", "", 10.0),
      (2L, 3000L + H, 4L, "view", "", 0.0),
      (2L, 4000L + H, 5L, "purchase", "", 20.0)),
    Seq((2L, 5000L + H + H / 2, 6L, "purchase", "", 30.0)))

  private def toDf(rows: Seq[(Long, Long, Long, String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "tsu", "event_id", "event_type", "props", "value")
  }

  test("streamed credit partials accumulate to the one-shot linear split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("attr_out").toString
    val st = java.nio.file.Files.createTempDirectory("attr_state").toString
    val ck = java.nio.file.Files.createTempDirectory("attr_ck").toString

    val mem = MemoryStream[(Long, Long, Long, String, String, Double)]
    val q = AttributionStream.start(
      mem.toDS().toDF("user_id", "tsu", "event_id", "event_type", "props", "value"),
      st, out, ck)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.read.parquet(out)
        .groupBy("touch_type")
        .agg(sum(col("credit_ct")).as("ct"), sum(col("credit_bp_sum")).as("bp"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      val all = toDf(batches.flatten)
      val touches = all.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("tsu"), col("event_id").as("touch_id"),
          col("event_type").as("touch_type"))
      val facts = all.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsu"), col("event_id"), col("value"))
      val expected = Temporal.linearSplit(
          Temporal.windowPairs(touches, facts), facts)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2))).toMap

      assert(got == expected, s"streamed $got, one-shot $expected")
      // conservation across the whole stream
      assert(got.values.map(_._2).sum == 10000L * 3)
      // the fixture's point: purchase 3 credits a BATCH-1 view (cross-
      // batch window), purchase 6 credits only the batch-2 view (the
      // batch-1 click was evicted AND out of window) — so 'click' earns
      // nothing and 'view' carries two purchases' credit
      assert(!got.contains("click"))
      assert(got("view") == (3L, 30000L))
    } finally q.stop()
  }

  test("eviction bounds state to the window") {
    val st = java.nio.file.Files.createTempDirectory("attr_state2").toString
    val (_, s1) = AttributionStream.creditBatch(spark, toDf(batches(0)), st, 0L)
    graft.sources.SnapshotTable.publish(s1, st, "v0")
    assert(s1.count() == 2)
    val (_, s2) = AttributionStream.creditBatch(spark, toDf(batches(1)), st, 1L)
    // user 2's batch-1 click (tsu 500) is > 1h older than the batch-2
    // high-water and must be gone; user 1's view (1000) likewise
    val kept = s2.select("touch_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"state after eviction: $kept")
  }
}
