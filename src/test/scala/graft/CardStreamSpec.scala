package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of the corpus dataset card: micro-batch partials
  * committed per batch id, live card = re-aggregation of partials. Since
  * every card column is a sum/count or a set union (the two-shard merge
  * law SkewReportSpec proves), the streamed card over N arbitrary batch
  * boundaries must equal the one-shot batch card EXACTLY — on the real
  * sf0.001 documents table, not a toy fixture.
  */
class CardStreamSpec extends SparkSpec {

  test("streamed per-batch partials re-aggregate to the one-shot corpus card") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(docs.nonEmpty)
    // three uneven batches (boundaries must not matter)
    val batches = Seq(docs.take(7), docs.slice(7, 30), docs.drop(30))

    val parts = java.nio.file.Files.createTempDirectory("card_parts").toString
    val ckpt = java.nio.file.Files.createTempDirectory("card_ck").toString
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = streaming.CardStream.start(
      mem.toDS().toDF("doc_id", "text", "lang", "source", "n_chars"),
      parts, ckpt)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally { q.stop(); q.awaitTermination() }

    // one committed partial set per batch
    val batchIds = spark.read.parquet(parts).select("batch_id")
      .distinct().as[Int].collect().toSet
    assert(batchIds == Set(0, 1, 2), s"expected 3 batch partials, got $batchIds")

    val streamed = streaming.CardStream.liveCard(spark, parts)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    val oneShot = operators.TextAnalysis.corpusCard
      .run(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    assert(streamed == oneShot,
      s"live card must equal the one-shot card\nstreamed: $streamed\nbatch:    $oneShot")
  }
}
