package graft

import graft.operators.{InvertedIndex, LsmIndex}
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** LSM-segment index maintenance: bytes written per batch ∝ the batch
  * unconditionally (a fresh immutable segment, never a tile rewrite),
  * size-tiered compaction touching only the smallest segments, replay
  * idempotence, the fresh-checkpoint guard, and a kill-and-resume proof.
  */
class LsmIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"lsm_$tag").toString
    operators.SnapshotDiff.rmTree(d); d
  }

  private def docsDf(ids: Seq[Long]) =
    ids.map(i => (i, s"tok${"%04d".format(i)} filler")).toDF("doc_id", "text")

  private def postingRows(root: String) =
    LsmIndex.readAll(spark, root)
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  test("segments ≡ one-shot rebuild; a batch writes only its own postings") {
    val dir = freshDir("eq")
    val batches = Seq((1L to 80L), (81L to 160L), (161L to 240L))
    batches.zipWithIndex.foreach { case (ids, b) =>
      LsmIndex.applyDocBatch(docsDf(ids), b.toLong, dir)
    }
    val full = InvertedIndex.publishIndex(
      docsDf(1L to 240L), freshDir("eqfull"))
    val fullRows = SnapshotTable.read(spark, full).get
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(postingRows(dir) === fullRows)
    // the batch-∝-bytes law, structurally: each live segment holds
    // exactly its own batch's postings, no rewritten carry-over
    val segs = LsmIndex.liveSegments(dir)
    assert(segs.size === 3)
    segs.foreach { s =>
      val rows = SnapshotTable.read(spark, s"$dir/$s").get.count()
      assert(rows === 160L, // 80 docs x 2 tokens each
        s"segment $s must hold exactly its batch's postings, got $rows")
    }
  }

  test("replay of the last batch is a no-op (segments and manifest stable)") {
    val dir = freshDir("replay")
    LsmIndex.applyDocBatch(docsDf(1L to 50L), 0L, dir)
    LsmIndex.applyDocBatch(docsDf(51L to 100L), 1L, dir)
    val before = postingRows(dir)
    val manifestBefore = LsmIndex.liveSegments(dir)
    LsmIndex.applyDocBatch(docsDf(51L to 100L), 1L, dir) // foreachBatch replay
    assert(LsmIndex.liveSegments(dir) === manifestBefore)
    assert(postingRows(dir) === before)
  }

  test("size-tiered compaction merges ONLY the smallest segments") {
    val dir = freshDir("tier")
    // batch 0 is BIG; batches 1..4 small; cap 3 → compactions must fold
    // small segments together and never rewrite the big one
    LsmIndex.applyDocBatch(docsDf(1L to 400L), 0L, dir, maxSegments = 3)
    (1 to 4).foreach { b =>
      LsmIndex.applyDocBatch(
        docsDf((400L + 10 * (b - 1) + 1) to (400L + 10 * b)),
        b.toLong, dir, maxSegments = 3)
    }
    val segs = LsmIndex.liveSegments(dir)
    assert(segs.size <= 3, s"cap must hold, got $segs")
    assert(segs.contains("seg_0"),
      s"the big segment must never be rewritten by small-tier merges: $segs")
    // content is still the full corpus truth
    val full = InvertedIndex.publishIndex(
      docsDf(1L to 440L), freshDir("tierfull"))
    val fullRows = SnapshotTable.read(spark, full).get
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(postingRows(dir) === fullRows)
    // term lookups prune inside every segment and return the scan truth
    val hit = LsmIndex.termLookup(spark, dir, "tok0405")
    assert(hit.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(405L))
  }

  test("fresh checkpoint against an existing index fails loudly") {
    val dir = freshDir("guard")
    LsmIndex.applyDocBatch(docsDf(1L to 30L), 5L, dir)
    val e = intercept[IllegalArgumentException] {
      LsmIndex.applyDocBatch(docsDf(31L to 60L), 0L, dir)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
  }

  test("a concurrent segment add interleaved at a compaction's swap is never lost") {
    val dir = freshDir("race")
    // four segments, no compaction yet
    (0 to 3).foreach { b =>
      LsmIndex.applyDocBatch(docsDf((b * 50L + 1) to (b * 50L + 50)),
        b.toLong, dir, maxSegments = 99)
    }
    // at the instant the compaction has derived its retire-swap but not
    // yet taken the lock, a streaming writer lands a FIFTH segment. The
    // old unlocked read-modify-write swapped from the stale read and
    // lost it; the locked swap re-reads inside the lock and keeps it.
    var interleaved = false
    LsmIndex.onBeforeManifestSwap = r =>
      if (r == dir && !interleaved) {
        interleaved = true // one-shot: the nested add re-enters this seam
        LsmIndex.applyDocBatch(docsDf(201L to 250L), 4L, dir, maxSegments = 99)
      }
    try LsmIndex.compactSmallest(spark, dir, 3L, maxSegments = 3)
    finally LsmIndex.onBeforeManifestSwap = _ => ()
    assert(interleaved)
    val live = LsmIndex.liveSegments(dir)
    assert(live.contains("seg_4"),
      s"the interleaved add must survive the compaction's swap, got $live")
    // and the union is the full 250-doc truth — nothing lost, nothing doubled
    val full = InvertedIndex.publishIndex(
      docsDf(1L to 250L), freshDir("racefull"))
    val fullRows = SnapshotTable.read(spark, full).get
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(postingRows(dir) === fullRows)
  }

  test("a reader resolved before a compaction keeps valid paths; retired segments GC after the window") {
    val dir = freshDir("window")
    (0 to 3).foreach { b =>
      LsmIndex.applyDocBatch(docsDf((b * 40L + 1) to (b * 40L + 40)),
        b.toLong, dir, maxSegments = 99)
    }
    val preSegs = LsmIndex.liveSegments(dir)
    // reader resolves the 4-segment manifest (file listing happens here)
    val pre = LsmIndex.readAll(spark, dir)
    LsmIndex.compactSmallest(spark, dir, 3L, maxSegments = 2)
    val retired = preSegs.filterNot(LsmIndex.liveSegments(dir).contains)
    assert(retired.nonEmpty)
    retired.foreach(s => assert(new java.io.File(s"$dir/$s").exists(),
      s"retired segment $s must survive its own swap for the reader window"))
    // the pre-compaction reader still scans cleanly (old paths valid)
    assert(pre.count() === 160L * 2) // 160 docs x 2 tokens
    // two more swaps age the retired segments past RetireWindow
    LsmIndex.applyDocBatch(docsDf(161L to 170L), 4L, dir, maxSegments = 99)
    LsmIndex.applyDocBatch(docsDf(171L to 180L), 5L, dir, maxSegments = 99)
    retired.foreach(s => assert(!new java.io.File(s"$dir/$s").exists(),
      s"retired segment $s must be GC'd once the window has passed"))
  }

  test("term lookup reads at most one pruned tile per live segment (executed-plan pin)") {
    val dir = freshDir("amp")
    // 3 segments x 2000 docs = 4000 posting rows each → 2+ tiles per
    // segment, so the ≤1-file-per-segment pin proves intra-segment
    // pruning rather than trivially counting single-file segments
    (0 to 2).foreach { b =>
      LsmIndex.applyDocBatch(docsDf((b * 2000L + 1) to (b * 2000L + 2000)),
        b.toLong, dir, maxSegments = 99)
    }
    val segs = LsmIndex.liveSegments(dir)
    assert(segs.size === 3)
    val totalFiles = segs.map(s =>
      SnapshotTable.read(spark, s"$dir/$s").get.inputFiles.length).sum
    assert(totalFiles >= 6, s"need multi-tile segments for the pin, got $totalFiles")
    val hit = LsmIndex.termLookup(spark, dir, "tok1234")
    assert(hit.inputFiles.length <= segs.size,
      s"lookup amplification must be ≤ live segments (${segs.size}), " +
        s"read ${hit.inputFiles.length} of $totalFiles files")
    assert(hit.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1234L))
  }

  test("replaying a batch whose own compaction retired its segment is a whole-batch no-op") {
    val dir = freshDir("tombstone")
    // seg_0 big, seg_1/seg_2 medium, seg_3 smallest; cap 3 → batch 3's
    // own applyDocBatch compacts, merging seg_3 (smallest) + seg_1 —
    // retiring the very segment the batch just added
    LsmIndex.applyDocBatch(docsDf(1L to 200L), 0L, dir, maxSegments = 3)
    LsmIndex.applyDocBatch(docsDf(201L to 250L), 1L, dir, maxSegments = 3)
    LsmIndex.applyDocBatch(docsDf(251L to 300L), 2L, dir, maxSegments = 3)
    LsmIndex.applyDocBatch(docsDf(301L to 310L), 3L, dir, maxSegments = 3)
    val live = LsmIndex.liveSegments(dir)
    assert(!live.contains("seg_3"),
      s"fixture: batch 3's segment must have been retired by its own compaction, got $live")
    val manifestBefore = live
    val before = postingRows(dir)
    // the foreachBatch replay (crash after the retire-swap, before the
    // checkpoint commit): must not resurrect seg_3 — a re-add would
    // double-count its postings AND queue a live directory for deletion
    LsmIndex.applyDocBatch(docsDf(301L to 310L), 3L, dir, maxSegments = 3)
    assert(LsmIndex.liveSegments(dir) === manifestBefore,
      "the replay must not re-add the tombstoned segment")
    assert(postingRows(dir) === before, "no postings double-counted")
    // two more swaps age the tombstoned dirs out; the union must stay
    // the full truth (the manifest never references a deleted directory)
    LsmIndex.applyDocBatch(docsDf(311L to 320L), 4L, dir, maxSegments = 99)
    LsmIndex.applyDocBatch(docsDf(321L to 330L), 5L, dir, maxSegments = 99)
    val full = InvertedIndex.publishIndex(
      docsDf(1L to 330L), freshDir("tombfull"))
    val fullRows = SnapshotTable.read(spark, full).get
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(postingRows(dir) === fullRows,
      "post-GC the maintained index must still equal the rebuild")
  }

  test("the LSM stream survives a kill-and-resume on its checkpoint") {
    val work = java.nio.file.Files.createTempDirectory("lsm_restart").toString
    val in = s"$work/in"; val ckpt = s"$work/ckpt"; val dir = s"$work/t"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val docs1 = (1L to 150L).map(i => (i, s"tok${"%04d".format(i)} filler"))
    val docs2 = (151L to 300L).map(i => (i, s"tok${"%04d".format(i)} filler"))
    val schema = docs1.toDF("doc_id", "text").schema
    def start() = LsmIndex.startIndexStream(
      spark.readStream.schema(schema).parquet(in), dir, ckpt)
    docs1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    docs2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val full = InvertedIndex.publishIndex(
      (docs1 ++ docs2).toDF("doc_id", "text"), s"$work/full")
    val fullRows = SnapshotTable.read(spark, full).get
      .select("token", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(postingRows(dir) === fullRows,
      "the resumed stream must continue the segment set, not restart it")
  }
}
