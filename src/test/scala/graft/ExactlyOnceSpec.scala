package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The exactly-once verdict sink: a replayed micro-batch must leave the
  * output byte-identical (one copy), and the exactly-once dedup stream
  * must accumulate the same verdicts as the at-least-once appender.
  */
class ExactlyOnceSpec extends SparkSpec {

  test("replayed batch overwrites its own partition — no duplicates") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("eo_out").toString + "/v"
    val df = Seq((1L, 1L, -1L), (2L, 0L, 1L)).toDF("doc_id", "is_keeper", "dup_of")
    streaming.ExactlyOnce.write(df, out, 7L)
    streaming.ExactlyOnce.write(df, out, 7L) // the at-least-once replay
    streaming.ExactlyOnce.write(df, out, 8L) // a distinct later batch
    val got = spark.read.parquet(out)
    assert(got.count() == 4, "replay must not duplicate batch 7's rows")
    // partition discovery types batch_id as the narrowest integer
    assert(got.selectExpr("CAST(batch_id AS BIGINT)").distinct()
      .collect().map(_.getLong(0)).toSet == Set(7L, 8L),
      "partition discovery must expose the batch ids")
  }

  test("exactly-once dedup stream equals the appender's verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text1 = ("alpha beta gamma delta " * 12).trim
    val batches = Seq(
      Seq((1L, text1), (2L, "completely different content about oceans")),
      Seq((10L, text1), (11L, "unique snowflake sentence nothing shared")))

    def run(exactlyOnce: Boolean): Set[(Long, Long, Long)] = {
      val idx = java.nio.file.Files.createTempDirectory("eo_idx").toString + "/idx"
      val out = java.nio.file.Files.createTempDirectory("eo_v").toString
      val ckpt = java.nio.file.Files.createTempDirectory("eo_ck").toString
      val mem = MemoryStream[(Long, String)]
      val q = streaming.DedupStream.start(
        mem.toDS().toDF("doc_id", "text"), idx, out, ckpt, exactlyOnce)
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        spark.read.parquet(out).select("doc_id", "is_keeper", "dup_of")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      } finally { q.stop(); CacheRegistry.clear() }
    }

    val eo = run(exactlyOnce = true)
    val append = run(exactlyOnce = false)
    assert(eo == append, s"delivery mode must not change verdicts: $eo vs $append")
    assert(eo.exists(v => v._1 == 10L && v._2 == 0L && v._3 == 1L),
      "fixture sanity: the cross-batch dup drops toward doc 1")
  }
}
