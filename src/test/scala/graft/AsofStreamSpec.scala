package graft

import graft.streaming.AsofStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming as-of enrichment twin: a time-ordered micro-batch feed
  * through the snapshot-table dim state must assign every purchase the
  * SAME touch the one-shot union-merge assigns on the full feed — and a
  * replayed batch must recompute exactly, including the case the
  * keep-latest state compaction makes hard (a mid-batch fact whose match
  * lives only in pre-batch state).
  */
class AsofStreamSpec extends SparkSpec {

  // (user_id, tsu, event_id, event_type, props, value); batch 2 plants the
  // hard case: user 2's purchase at t=450 must match the batch-1 touch at
  // 400 even though a LATER touch at 500 lands in the same batch (and
  // will be all the state retains afterwards)
  private val batches = Seq(
    Seq((1L, 100L, 1L, "view", "a", 0.0), (2L, 400L, 2L, "view", "c", 0.0),
      (1L, 150L, 3L, "purchase", "", 10.0)),
    Seq((2L, 450L, 4L, "purchase", "", 20.0), (2L, 500L, 5L, "click", "d", 0.0),
      (2L, 500L, 6L, "view", "e", 0.0), (2L, 501L, 7L, "purchase", "", 30.0)),
    Seq((3L, 900L, 8L, "purchase", "", 40.0), (1L, 950L, 9L, "purchase", "", 50.0)))

  private def toDf(rows: Seq[(Long, Long, Long, String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "tsu", "event_id", "event_type", "props", "value")
  }

  private def matchedOf(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "m_type", "m_tsu").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

  test("streamed micro-batches assign the one-shot as-of matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("asof_out").toString
    val st = java.nio.file.Files.createTempDirectory("asof_state").toString
    val ck = java.nio.file.Files.createTempDirectory("asof_ck").toString

    val mem = MemoryStream[(Long, Long, Long, String, String, Double)]
    val q = AsofStream.start(
      mem.toDS().toDF("user_id", "tsu", "event_id", "event_type", "props", "value"),
      st, out, ck)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = matchedOf(spark.read.parquet(out))

      val all = toDf(batches.flatten)
      val expected = matchedOf(operators.Temporal.asofMatch(
        all.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("tsu"), col("event_id").as("touch_id"),
            col("event_type").as("touch_type"), col("props").as("touch_props")),
        all.filter(col("event_type") === "purchase")
          .select("user_id", "tsu", "event_id", "value")))

      assert(got == expected, s"streamed $got, one-shot $expected")
      // the planted hard case: matched to the PRE-batch touch, and the
      // same-microsecond tie (500 click id5 / view id6) to the max id
      assert(got.contains((4L, Some("view"), Some(400L))))
      assert(got.contains((7L, Some("view"), Some(500L))))
      assert(got.contains((8L, None, None)))
    } finally q.stop()
  }

  test("stateDepth bounds out-of-order tolerance: a late fact matches iff its touch is retained") {
    // batch A: touches at 100 ("view") and 200 ("click") for user 1;
    // batch B arrives LATE with a purchase at 150, whose correct match
    // (the 100 view) is not the user's newest touch
    val bA = toDf(Seq((1L, 100L, 1L, "view", "a", 0.0),
      (1L, 200L, 2L, "click", "b", 0.0)))
    val bB = toDf(Seq((1L, 150L, 3L, "purchase", "", 5.0)))
    for ((depth, expected) <- Seq(1 -> None, 2 -> Some("view"))) {
      val st = java.nio.file.Files.createTempDirectory(s"asof_late$depth").toString
      val (_, s1) = AsofStream.enrichBatch(spark, bA, st, 0L, depth)
      graft.sources.SnapshotTable.publish(s1, st, "v0")
      assert(s1.count() == depth, "state must hold exactly depth rows")
      val (m, _) = AsofStream.enrichBatch(spark, bB, st, 1L, depth)
      assert(matchedOf(m) ==
        Set((3L, expected, expected.map(_ => 100L))),
        s"depth $depth late-fact match")
    }
  }

  test("a depth-2 stream end-to-end recovers a late fact's match across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("asof_ooo_out").toString
    val st = java.nio.file.Files.createTempDirectory("asof_ooo_state").toString
    val ck = java.nio.file.Files.createTempDirectory("asof_ooo_ck").toString
    // batch 1 carries both touches; batch 2 arrives LATE with a purchase
    // between them — only depth >= 2 state still holds the older touch
    val ooo = Seq(
      Seq((1L, 100L, 1L, "view", "a", 0.0), (1L, 200L, 2L, "click", "b", 0.0)),
      Seq((1L, 150L, 3L, "purchase", "", 5.0)))
    val mem = MemoryStream[(Long, Long, Long, String, String, Double)]
    val q = AsofStream.start(
      mem.toDS().toDF("user_id", "tsu", "event_id", "event_type", "props", "value"),
      st, out, ck, stateDepth = 2)
    try {
      ooo.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      assert(matchedOf(spark.read.parquet(out)) ==
        Set((3L, Some("view"), Some(100L))))
    } finally q.stop()
  }

  test("post-publish replay of a batch recomputes identical matches") {
    val st = java.nio.file.Files.createTempDirectory("asof_state2").toString
    val b1 = toDf(batches(0))
    val b2 = toDf(batches(1))
    val (_, s1) = AsofStream.enrichBatch(spark, b1, st, 0L)
    graft.sources.SnapshotTable.publish(s1, st, "v0")
    val (m2, s2) = AsofStream.enrichBatch(spark, b2, st, 1L)
    val first = matchedOf(m2)
    // crash AFTER batch 1's state publish, BEFORE offset commit:
    graft.sources.SnapshotTable.publish(s2, st, "v1")
    val (m2r, s2r) = AsofStream.enrichBatch(spark, b2, st, 1L)
    assert(matchedOf(m2r) == first,
      "replay against post-publish state must recompute the same matches")
    assert(first.contains((4L, Some("view"), Some(400L))),
      "the mid-batch fact must keep its pre-batch match on replay")
    assert(s2r.exceptAll(s2).isEmpty && s2.exceptAll(s2r).isEmpty)
  }
}
