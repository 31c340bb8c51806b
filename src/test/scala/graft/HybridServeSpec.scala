package graft

import graft.operators.{Retrieval, SnapshotDiff, TextEmbed}
import graft.streaming.{AnnStream, SearchStream}
import graft.{Tables => T}
import org.apache.spark.sql.functions._

/** The hybrid fused serve is COMPACTION- and BATCHING-invariant: the same
  * corpus ingested as one batch (no compaction) and as four batches under
  * a segment cap of 2 (LSM compaction + retired segments on the lexical
  * leg) must serve the identical fused ranking, and a replayed batch must
  * change nothing. This is the serve-across-compaction law for
  * `search_hybrid_maintained` — the per-leg machinery laws live in
  * SearchStreamSpec / AnnStreamSpec; this spec pins the FUSED read.
  */
class HybridServeSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"hybrid_$tag").toString

  private def ingest(root: String, nBatches: Int, cap: Int): Unit = {
    val docs = T.load(spark, sf, "documents")
    SearchStream.contiguousBatches(docs, nBatches).zipWithIndex.foreach {
      case (b, i) => SearchStream.applyBatch(b, i + 1L, root, maxSegments = cap)
    }
    val dv = TextEmbed.normalizedDocVectors(spark, sf)
    SearchStream.contiguousBatches(dv, nBatches).zipWithIndex.foreach {
      case (b, i) => AnnStream.applyBatch(
        b.withColumnRenamed("doc_id", "vec_id"), i + 1L, s"$root/ann")
    }
  }

  private def served(root: String): Seq[Seq[Any]] = {
    val out = Retrieval.hybridServe(spark, sf, root, s"$root/ann")
      .collect().map(_.toSeq.toSeq).toSeq
    CacheRegistry.clear()
    out
  }

  test("fused serve is identical across single-batch and compacted ingest, and under replay") {
    val one = freshDir("one"); val four = freshDir("four")
    ingest(one, 1, 8)
    ingest(four, 4, 2)
    // the 4-batch cap-2 ingest actually compacted: fewer live segments
    // than batches ingested
    assert(graft.operators.LsmIndex
      .liveSegments(SearchStream.indexRoot(four)).size < 4,
      "expected the lexical index to have compacted")
    val a = served(one)
    val b = served(four)
    assert(a == b, "fused serve diverged between batchings")
    // replay the final batch on the compacted root: nothing changes
    val docs = T.load(spark, sf, "documents")
    SearchStream.applyBatch(
      SearchStream.contiguousBatches(docs, 4).last, 4L, four, maxSegments = 2)
    val dv = TextEmbed.normalizedDocVectors(spark, sf)
    AnnStream.applyBatch(
      SearchStream.contiguousBatches(dv, 4).last
        .withColumnRenamed("doc_id", "vec_id"), 4L, s"$four/ann")
    assert(served(four) == a, "a replayed batch changed the fused serve")
    SnapshotDiff.rmTree(one); SnapshotDiff.rmTree(four)
    CacheRegistry.clearAll()
  }
}
