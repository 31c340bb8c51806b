package graft

import org.apache.spark.sql.DataFrame

/** Multi-crawl incremental dedup with MID-SEQUENCE INDEX COMPACTION: a
  * 5-batch crawl sequence must produce identical verdicts whether or not
  * the index is compacted (deltas folded into an atomically-published
  * SnapshotTable base, dropped docs pruned) after batch 2 — and the
  * compacted index must actually be smaller: row count bounded by the
  * RETAINED corpus (3 band rows + 1 shingle row per keeper) and the
  * per-crawl append files folded to one snapshot per table.
  */
class IndexCompactionSpec extends SparkSpec {

  private val textA = ("alpha beta gamma delta epsilon " * 10).trim
  private val textB = "completely different content about oceans tides and currents rolling"
  private val textC = "a third theme entirely mountains glaciers and alpine meadows blooming"

  // 5 batches; every dropped doc's earliest partner is a KEPT doc, the
  // common crawl shape (the chain-to-dropped divergence case is the
  // documented policy difference, not this spec's subject)
  private val batches = Seq(
    Seq((1L, textA), (2L, textB)),
    Seq((10L, textA), (11L, textC)),
    Seq((20L, textB + " rolling"), (21L, "fresh unique sentence with nothing shared")),
    Seq((30L, textA), (31L, textC + " blooming")),
    Seq((40L, textB), (41L, textA), (42L, "final singleton line about deserts and dunes")))

  private def ingest(idx: String, b: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val out = operators.IncrementalDedup
      .ingestBatch(spark, b.toDF("doc_id", "text"), idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    CacheRegistry.clear()
    out
  }

  private def keepersOf(vs: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    vs.filter(_._2 == 1L).map(_._1).toDF("doc_id")
  }

  private def freshIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"compaction_$tag").toString + "/idx"

  test("verdicts are stable across a mid-sequence compaction; index shrinks") {
    // run A: 5 crawls, never compacted
    val idxA = freshIdx("plain")
    val plain = batches.flatMap(b => ingest(idxA, b))

    // run B: same crawls, compact (with keeper pruning) after batch 2
    val idxB = freshIdx("compacted")
    val first = batches.take(2).flatMap(b => ingest(idxB, b))
    val preRows = spark.read.parquet(s"$idxB/bands").count()
    operators.IncrementalDedup.compactIndex(spark, idxB, Some(keepersOf(first)))
    val rest = batches.drop(2).flatMap(b => ingest(idxB, b))

    assert((first ++ rest).sortBy(_._1) == plain.sortBy(_._1),
      "compaction must not change any verdict in this keeper-anchored sequence")

    // size bound: post-compaction base rows = 3 band rows per KEPT doc of
    // the first two crawls
    val keepers = first.count(_._2 == 1L)
    val base = sources.SnapshotTable.read(spark, s"$idxB/bands_base")
    assert(base.isDefined, "compaction must publish a base snapshot")
    assert(base.get.count() == 3L * keepers,
      s"pruned base must hold exactly 3 band rows per keeper ($keepers keepers)")
    assert(base.get.count() < preRows,
      "pruning must actually shrink the index (fixture plants dups)")
    val shBase = sources.SnapshotTable.read(spark, s"$idxB/shingles_base")
    assert(shBase.get.count() == keepers.toLong,
      "pruned shingle base must hold one row per keeper")
    // deltas were cleared; post-compaction crawls re-created them
    assert(spark.read.parquet(s"$idxB/bands").count() ==
      3L * batches.drop(2).map(_.size).sum,
      "post-compaction deltas must hold exactly the later crawls' bands")
  }

  test("pure file compaction (no pruning) also preserves verdicts and collapses replays") {
    import spark.implicits._
    val idx = freshIdx("files")
    val v1 = ingest(idx, batches(0))
    // simulate an at-least-once replay: re-append batch 0's band rows by
    // re-ingesting it (the documented foreachBatch replay shape)
    ingest(idx, batches(0))
    operators.IncrementalDedup.compactIndex(spark, idx, None)
    val base = sources.SnapshotTable.read(spark, s"$idx/bands_base").get
    assert(base.count() == 3L * batches(0).size,
      "distinct() must collapse the replayed duplicate band rows")
    // sequence continues correctly against the compacted base
    val v2 = ingest(idx, batches(1))
    assert(v2.find(_._1 == 10L).exists(v => v._2 == 0L && v._3 == 1L),
      "post-compaction crawl must still drop the cross-batch dup toward doc 1")
    assert(v1.forall(_._2 == 1L), "first crawl keeps both docs")
  }
}
