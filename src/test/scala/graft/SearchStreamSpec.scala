package graft

import graft.operators.Retrieval
import graft.sources.SnapshotTable
import graft.streaming.SearchStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maintained BM25 serving ([[SearchStream]]): after every ingest batch,
  * the ranking served off maintained state (LSM index segments + additive
  * df/dl/counter tables) must equal the batch BM25 rebuilt over all
  * documents so far — including across segment compactions. Plus the
  * exactly-once proofs (replay changes nothing), the ALL-ROOTS
  * fresh-checkpoint guard (a partial wipe fails loudly on whichever table
  * survived), and a kill-and-resume through a real checkpoint.
  */
class SearchStreamSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"searchstream_$tag").toString

  /** ≥40-token vocabulary with a deterministic df spread so
    * [[Retrieval.queryTerms]]'s ranks 10/20/30 all resolve; doc lengths
    * vary so the BM25 length normalization actually discriminates.
    */
  private def fixtureRows: Seq[(Long, String)] =
    (0L until 24L).map { i =>
      val words = (0 until (6 + (i % 7)).toInt).map { j =>
        s"w${(i * 5 + j * 3) % 41}"
      } ++ (0 until (i % 4).toInt).map(j => s"w${(i + j) % 13}")
      i -> words.mkString(" ")
    }

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The batch BM25 over `docs` — the corpus-scan truth the maintained
    * serving path must reproduce.
    */
  private def rebuild(docs: DataFrame): DataFrame = {
    val tf = Retrieval.termFreqs(docs)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val p = Retrieval.partsFrom(tf, dl)
    Retrieval.topDocs(Retrieval.bm25Scores(p.tf, p.qterms, p.dl, p.stats))
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("rank", "doc_id", "terms_hit", "score_x1000").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("served ranking equals the batch rebuild after every batch, across a compaction") {
    val root = freshDir("law")
    val all = fixtureRows
    val batches = all.grouped(6).toSeq // 4 batches; cap 2 forces compaction
    var seen = Seq.empty[(Long, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      SearchStream.applyBatch(docsOf(b), i.toLong + 1, root, maxSegments = 2)
      seen = seen ++ b
      assert(rows(SearchStream.serve(spark, root).get) ==
        rows(rebuild(docsOf(seen))),
        s"after batch ${i + 1} the served ranking must equal the rebuild")
      graft.CacheRegistry.clear()
    }
    // replay of the last batch: served ranking and the stat table unchanged
    val before = rows(SearchStream.serve(spark, root).get)
    val statsBefore = SnapshotTable.read(spark, SearchStream.statsRoot(root))
      .get.collect().map(_.toString).sorted.toSeq
    SearchStream.applyBatch(docsOf(batches.last), batches.size.toLong, root,
      maxSegments = 2)
    assert(rows(SearchStream.serve(spark, root).get) == before,
      "a replayed batch must serve the identical ranking")
    assert(SnapshotTable.read(spark, SearchStream.statsRoot(root)).get
      .collect().map(_.toString).sorted.toSeq == statsBefore,
      "a replayed batch must not double-count the maintained statistics")
    graft.CacheRegistry.clear()
  }

  test("a partial wipe fails loudly on whichever root survived") {
    val root = freshDir("wipe")
    fixtureRows.grouped(8).zipWithIndex.foreach { case (b, i) =>
      SearchStream.applyBatch(docsOf(b.toSeq), i.toLong + 1, root)
    }
    // stats wiped, index surviving
    graft.operators.SnapshotDiff.rmTree(SearchStream.statsRoot(root))
    val e1 = intercept[IllegalArgumentException] {
      SearchStream.applyBatch(docsOf(fixtureRows.take(3)), 1L, root)
    }
    assert(e1.getMessage.contains("fresh checkpoint"))
    // index wiped, stats surviving: the stat-table guard fires
    val root2 = freshDir("wipe2")
    fixtureRows.grouped(8).zipWithIndex.foreach { case (b, i) =>
      SearchStream.applyBatch(docsOf(b.toSeq), i.toLong + 1, root2)
    }
    graft.operators.SnapshotDiff.rmTree(SearchStream.indexRoot(root2))
    val e2 = intercept[IllegalArgumentException] {
      SearchStream.applyBatch(docsOf(fixtureRows.take(3)), 1L, root2)
    }
    assert(e2.getMessage.contains("fresh checkpoint"))
    graft.CacheRegistry.clear()
  }

  test("the search stream survives a kill-and-resume on its checkpoint") {
    import spark.implicits._
    val work = freshDir("restart")
    val in = s"$work/in"; val ckpt = s"$work/ckpt"
    val root = s"$work/search"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val (chunk1, chunk2) = fixtureRows.splitAt(12)
    val schema = chunk1.toDF("doc_id", "text").schema
    def start() = SearchStream.start(
      spark.readStream.schema(schema).parquet(in), root, ckpt)
    chunk1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    chunk2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(rows(SearchStream.serve(spark, root).get) ==
      rows(rebuild(docsOf(fixtureRows))),
      "post-restart serving must reflect all documents across both runs")
    graft.CacheRegistry.clear()
  }
}
