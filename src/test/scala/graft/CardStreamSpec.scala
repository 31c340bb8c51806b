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

  test("kill-and-resume: the resumed stream neither loses nor double-counts a batch") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("card_restart").toString
    val dir = s"$work/in"; val parts = s"$work/parts"; val ckpt = s"$work/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def doc(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    val chunk1 = Seq(doc(1L, "alpha beta gamma", "srcA"), doc(2L, "delta epsilon", "srcA"))
    val chunk2 = Seq(doc(3L, "zeta eta theta", "srcA"), doc(4L, "iota kappa", "srcB"))
    val schema = chunk1.toDF("doc_id", "text", "lang", "source", "n_chars").schema
    def start() = streaming.CardStream.start(
      spark.readStream.schema(schema).parquet(dir), parts, ckpt)

    chunk1.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    chunk2.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("append").parquet(dir)
    val q2 = start()
    try q2.processAllAvailable() finally { q2.stop(); q2.awaitTermination() }

    // checkpoint honored: exactly one partial per batch, batch 1 not
    // reprocessed after the restart
    val ids = spark.read.parquet(parts).select("batch_id")
      .distinct().as[Int].collect().toSet
    assert(ids == Set(0, 1), s"expected exactly 2 batch partials, got $ids")
    // and the re-aggregated card equals the one-shot card over all docs
    val streamed = streaming.CardStream.liveCard(spark, parts)
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    val oneShot = operators.TextAnalysis.cardOutput(
      operators.TextAnalysis.cardPartials(
        (chunk1 ++ chunk2).toDF("doc_id", "text", "lang", "source", "n_chars")))
      .collect().map(_.toSeq).toSeq.sortBy(_.head.toString)
    assert(streamed == oneShot,
      s"restarted card must equal the one-shot card\nstreamed: $streamed\nbatch: $oneShot")
  }
}
