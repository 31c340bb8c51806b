package graft

import graft.operators.{CorpusStats, Graph}
import graft.sources.SnapshotTable
import graft.streaming.{CollocStream, RankStream}
import org.apache.spark.sql.functions._

/** Streaming twins for the two round-9 operator families that lacked
  * one: PageRank over streamed edge batches and collocation mining over
  * streamed document batches. The law, checked after EVERY batch:
  * streamed state ≡ the batch operator rebuilt over all input so far.
  * Plus the exactly-once proofs: replayed batches change nothing, and a
  * fresh-checkpoint restart against existing tables fails loudly.
  */
class CorpusStreamSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"corpstream_$tag").toString

  // -- PageRank over streamed edges ----------------------------------

  private def pairsOf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  private def rankRows(df: org.apache.spark.sql.DataFrame) =
    df.select("node", "out_n", "r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed edge batches: published ranks equal the batch rebuild after every batch") {
    val dir = freshDir("rank")
    val (edgeRoot, rankRoot) = (s"$dir/edges", s"$dir/ranks")
    val iters = 3
    // page-graph shaped batches, overlapping edges across batches so the
    // additive fold is actually exercised (not just inserts)
    val batches = Seq(
      Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 2L, 4L -> 1L),
      Seq(1L -> 2L, 3L -> 4L, 4L -> 5L, 5L -> 1L, 2L -> 3L),
      Seq(5L -> 6L, 6L -> 1L, 1L -> 2L, 2L -> 6L))
    var seen = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (b, i) =>
      RankStream.applyBatch(pairsOf(b), i.toLong + 1, edgeRoot, rankRoot,
        iters)
      seen = seen ++ b
      val edges = pairsOf(seen).groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val rebuild = Graph.pagerank(nodes, edges, iters)
        .select(col("node"), col("out_n"), col("r"))
      assert(rankRows(RankStream.liveRanks(spark, rankRoot).get) ==
        rankRows(rebuild),
        s"after batch ${i + 1} streamed ranks must equal the batch rebuild")
      graft.CacheRegistry.clear()
    }
    // replay of the last batch: both tables must come out identical
    val before = rankRows(RankStream.liveRanks(spark, rankRoot).get)
    val edgesBefore = SnapshotTable.read(spark, edgeRoot).get
      .collect().map(_.toString).sorted.toSeq
    RankStream.applyBatch(pairsOf(batches.last), batches.size.toLong,
      edgeRoot, rankRoot, iters)
    assert(rankRows(RankStream.liveRanks(spark, rankRoot).get) == before,
      "a replayed batch must republish the identical rank vector")
    assert(SnapshotTable.read(spark, edgeRoot).get
      .collect().map(_.toString).sorted.toSeq == edgesBefore,
      "a replayed batch must not double-count edges")
    // fresh-checkpoint restart (renumbered batch ids) fails loudly
    val e = intercept[IllegalArgumentException] {
      RankStream.applyBatch(pairsOf(batches.head), 0L, edgeRoot, rankRoot,
        iters)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
  }

  // -- Collocations over streamed documents --------------------------

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def liftRows(df: org.apache.spark.sql.DataFrame) =
    df.select("x", "y", "n_xy", "n_x", "n_y", "lift_bp").collect()
      .map(_.toString).toSet

  test("streamed doc batches: collocation report equals the batch rebuild after every batch") {
    val dir = freshDir("colloc")
    val (pairRoot, uniRoot) = (s"$dir/pairs", s"$dir/uni")
    val minPair = 2
    val batches = Seq(
      Seq(1L -> "the quick brown fox jumps over the lazy dog",
        2L -> "the quick brown fox runs fast"),
      Seq(3L -> "machine learning systems learn from data",
        4L -> "the quick brown cat sleeps"),
      Seq(5L -> "machine learning models need quick data",
        6L -> "brown fox and lazy dog again the quick brown fox"))
    var seen = Seq.empty[(Long, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      CollocStream.applyBatch(docsOf(b), i.toLong + 1, pairRoot, uniRoot)
      seen = seen ++ b
      val rebuild = CorpusStats.collocationsOf(docsOf(seen), minPair)
      assert(liftRows(CollocStream.liveReport(spark, pairRoot, uniRoot,
          minPair).get) == liftRows(rebuild),
        s"after batch ${i + 1} the maintained report must equal the rebuild")
      graft.CacheRegistry.clear()
    }
    // the maintained tables merged tile-locally (not full rewrites):
    // later versions must carry files from earlier ones
    def names(root: String, v: String) =
      new java.io.File(s"$root/$v").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert((names(uniRoot, "v2") intersect names(uniRoot, "v3")).nonEmpty,
      "unigram maintenance must carry untouched tiles across batches")
    // replay idempotence
    val before = liftRows(
      CollocStream.liveReport(spark, pairRoot, uniRoot, minPair).get)
    CollocStream.applyBatch(docsOf(batches.last), batches.size.toLong,
      pairRoot, uniRoot)
    assert(liftRows(CollocStream.liveReport(spark, pairRoot, uniRoot,
      minPair).get) == before,
      "a replayed batch must not double-count")
  }
}
