package graft

import graft.operators.CorpusStats
import graft.sources.SnapshotTable
import graft.streaming.VocabStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The vocabulary-growth streaming twin ([[VocabStream]]): after every
  * batch the curve served off maintained state (count-fold dl + MIN-fold
  * first occurrences) equals the batch rebuild over all documents so
  * far. The fixtures interleave ids across batches so the MIN-fold must
  * actually take minima (a later batch carries an EARLIER id for a seen
  * token), plus replay, all three wipe directions and a kill-and-resume.
  */
class VocabStreamSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"vocabstream_$tag").toString

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ids interleave across batches: 'late' first appears at id 9 in batch
  // 1, then at id 2 in batch 2 -> the maintained first-occurrence must
  // DROP to 2 (least), not keep 9 (insert-only would). Doc 6 is
  // TOKEN-LESS (punctuation only): it has no postings but is still a
  // document of its slice — the registry must count it (dl = 0).
  private val batch1 = Seq(
    1L -> "alpha beta gamma", 5L -> "alpha delta", 9L -> "late beta")
  private val batch2 = Seq(
    0L -> "alpha epsilon", 2L -> "late zeta", 6L -> "!!! ...",
    7L -> "beta gamma eta")

  private def rows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet

  private def rebuild(docs: Seq[(Long, String)]): DataFrame = {
    val d = docsOf(docs)
    CorpusStats.vocabGrowthOf(d, operators.Retrieval.termFreqs(d))
  }

  test("streamed curve equals the batch rebuild; the min-fold takes real minima") {
    val root = freshDir("law")
    VocabStream.applyBatch(docsOf(batch1), 1L, root)
    assert(rows(VocabStream.liveCurve(spark, root).get) ==
      rows(rebuild(batch1)), "after batch 1")
    VocabStream.applyBatch(docsOf(batch2), 2L, root)
    assert(rows(VocabStream.liveCurve(spark, root).get) ==
      rows(rebuild(batch1 ++ batch2)), "after batch 2")
    // the maintained first occurrence of 'late' moved 9 -> 2
    val fd = SnapshotTable.read(spark, VocabStream.firstsRoot(root)).get
      .filter(col("token") === "late").collect()
    assert(fd.length == 1 && fd.head.getAs[Long]("fd") == 2L,
      s"min-fold must take the earlier id: ${fd.toSeq}")
    // replay: curve and both tables unchanged
    val before = rows(VocabStream.liveCurve(spark, root).get)
    VocabStream.applyBatch(docsOf(batch2), 2L, root)
    assert(rows(VocabStream.liveCurve(spark, root).get) == before,
      "a replayed batch must not change the curve")
    graft.CacheRegistry.clear()
  }

  test("all three wipe directions fail loudly") {
    def build(): String = {
      val root = freshDir("wipe")
      VocabStream.applyBatch(docsOf(batch1), 1L, root)
      VocabStream.applyBatch(docsOf(batch2), 2L, root)
      root
    }
    // firsts wiped beside a multi-version dl: rejected even at the head id
    val r1 = build()
    operators.SnapshotDiff.rmTree(VocabStream.firstsRoot(r1))
    val e1 = intercept[IllegalArgumentException] {
      VocabStream.applyBatch(docsOf(batch2), 2L, r1)
    }
    assert(e1.getMessage.contains("fresh checkpoint"), e1.getMessage)
    // dl wiped beside firsts: always rejected (dl folds first)
    val r2 = build()
    operators.SnapshotDiff.rmTree(VocabStream.dlRoot(r2))
    val e2 = intercept[IllegalArgumentException] {
      VocabStream.applyBatch(docsOf(batch2), 2L, r2)
    }
    assert(e2.getMessage.contains("fresh checkpoint"), e2.getMessage)
    // renumbered batch ids against surviving tables: stale
    val r3 = build()
    val e3 = intercept[IllegalArgumentException] {
      VocabStream.applyBatch(docsOf(batch1), 1L, r3)
    }
    assert(e3.getMessage.contains("fresh checkpoint"), e3.getMessage)
    graft.CacheRegistry.clear()
  }

  test("the first batch's own crash window still replays") {
    val root = freshDir("crash")
    // simulate: dl folded, crash before the firsts fold, replay batch 1
    val post = operators.InvertedIndex.postings(docsOf(batch1))
    graft.streaming.AdditiveFold.foldInto(
      post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")),
      VocabStream.dlRoot(root), "doc_id", "dl", "dl", 1L, clusterFiles = 8)
    VocabStream.applyBatch(docsOf(batch1), 1L, root)
    assert(rows(VocabStream.liveCurve(spark, root).get) ==
      rows(rebuild(batch1)), "the crash replay must complete the batch")
    graft.CacheRegistry.clear()
  }

  test("the vocab stream survives a kill-and-resume on its checkpoint") {
    import spark.implicits._
    val work = freshDir("restart")
    val in = s"$work/in"; val ckpt = s"$work/ckpt"
    val root = s"$work/vocab"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val schema = batch1.toDF("doc_id", "text").schema
    def start() = VocabStream.start(
      spark.readStream.schema(schema).parquet(in), root, ckpt)
    batch1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    batch2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(VocabStream.liveCurve(spark, root).get) ==
      rows(rebuild(batch1 ++ batch2)),
      "post-restart curve must reflect all documents across both runs")
    graft.CacheRegistry.clear()
  }
}
