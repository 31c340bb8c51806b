package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{InvertedIndex, LsmIndex, SnapshotDiff}
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Scale probe for the corpus-proportional index tiling: does an
  * incremental merge rewrite bytes ∝ its BATCH, not ∝ the corpus?
  *
  * Protocol: build the inverted index over the corpus minus a held-out
  * tail, then merge held-out doc batches of increasing size and measure
  * — from the version directories' file layout, the ground truth the
  * `_STATS` carry discipline rides on — how many tiles (and bytes) each
  * merge rewrote vs carried (carried files keep their names byte-
  * identical; rewritten tiles get fresh write names). Run once under the
  * corpus-proportional layout ([[InvertedIndex.tileCountFor]]) and once
  * under round-9's fixed 8 tiles: the fixed layout rewrites ~the whole
  * index for ANY batch (every tile sees some of the batch vocabulary),
  * the proportional one bounds rewritten tiles by the batch vocabulary.
  *
  * One JSON line per (layout, batch) with rewritten/carried tile counts
  * and bytes plus the batch's doc count and vocabulary; BASELINE.md
  * records the sf0.1 and 100x-blowup captures.
  *
  * Usage: `sbt "runMain graft.tools.IndexMergeProbe <sfDir> [batchSizes]"`
  * (batchSizes CSV of held-out doc counts, default 10,100,1000)
  */
object IndexMergeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchSizes =
      if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(10, 100, 1000)
    val spark = GraftSession.getOrCreate("index-merge-probe")
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).persist()
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val holdout = batchSizes.sum
    require(maxId + 1 >= 2L * holdout,
      s"corpus ($maxId ids) must be at least 2x the held-out tail " +
        s"($holdout docs) — pass smaller batch sizes for this sfDir")
    val cut = maxId - holdout + 1

    for ((layoutTag, fixed) <- Seq("proportional" -> None, "fixed8" -> Some(8))) {
      val dir = sys.props("java.io.tmpdir") + s"/graft_idxprobe_$layoutTag"
      SnapshotDiff.rmTree(dir)
      val base = InvertedIndex.keyedPostings(docs.filter(col("doc_id") < cut))
        .persist()
      val baseTiles = fixed.getOrElse(InvertedIndex.tileCountFor(base.count()))
      SnapshotTable.publish(base, dir, "v1", retain = 2,
        statsCols = Seq("tok_doc"), clusterFiles = Some(baseTiles))
      base.unpersist(blocking = false)

      def layout(v: String): Map[String, Long] =
        Option(new java.io.File(s"$dir/$v").listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.length()).toMap

      var lo = cut
      var vn = 1L
      for (bs <- batchSizes) {
        val batch = docs.filter(col("doc_id") >= lo && col("doc_id") < lo + bs)
        val vocab = InvertedIndex.postings(batch)
          .select(col("token")).distinct().count()
        val before = layout(s"v$vn")
        vn += 1
        val t0 = System.nanoTime()
        InvertedIndex.applyDocBatch(batch, vn, dir)
        val secs = (System.nanoTime() - t0) / 1e9
        val after = layout(s"v$vn")
        val carried = after.filter { case (n, _) => before.contains(n) }
        val rewritten = after.filter { case (n, _) => !before.contains(n) }
        println(s"""{"probe":"index_merge","layout":"$layoutTag",""" +
          s""""batch_docs":$bs,"batch_vocab":$vocab,""" +
          s""""tiles_total":${after.size},"tiles_rewritten":${rewritten.size},""" +
          s""""bytes_total":${after.values.sum},""" +
          s""""bytes_rewritten":${rewritten.values.sum},""" +
          s""""bytes_carried":${carried.values.sum},""" +
          f""""merge_sec":$secs%.2f}""")
        lo += bs
      }
    }
    // the LSM-segment arm: every batch writes ONLY its own segment —
    // bytes written ∝ batch by construction; measured anyway so the
    // three layouts share one protocol and one table
    val lsmDir = sys.props("java.io.tmpdir") + "/graft_idxprobe_lsm"
    SnapshotDiff.rmTree(lsmDir)
    LsmIndex.applyDocBatch(docs.filter(col("doc_id") < cut), 0L, lsmDir)
    def lsmBytes(): Map[String, Long] =
      LsmIndex.liveSegments(lsmDir).flatMap { s =>
        Option(new java.io.File(s"$lsmDir/$s").listFiles())
          .getOrElse(Array.empty[java.io.File]).filter(_.isDirectory).flatMap(v =>
            Option(v.listFiles()).getOrElse(Array.empty[java.io.File])
              .filter(f => f.isFile && f.getName.endsWith(".parquet"))
              .map(f => s"$s/${v.getName}/${f.getName}" -> f.length()).toSeq)
      }.toMap
    var lsmLo = cut
    var lsmBatch = 0L
    for (bs <- batchSizes) {
      val batch = docs.filter(
        col("doc_id") >= lsmLo && col("doc_id") < lsmLo + bs)
      val vocab = InvertedIndex.postings(batch)
        .select(col("token")).distinct().count()
      val before = lsmBytes()
      lsmBatch += 1
      val t0 = System.nanoTime()
      LsmIndex.applyDocBatch(batch, lsmBatch, lsmDir)
      val secs = (System.nanoTime() - t0) / 1e9
      val after = lsmBytes()
      val written = after.filter { case (n, _) => !before.contains(n) }
      val carried = after.filter { case (n, _) => before.contains(n) }
      println(s"""{"probe":"index_merge","layout":"lsm",""" +
        s""""batch_docs":$bs,"batch_vocab":$vocab,""" +
        s""""tiles_total":${after.size},"tiles_rewritten":${written.size},""" +
        s""""bytes_total":${after.values.sum},""" +
        s""""bytes_rewritten":${written.values.sum},""" +
        s""""bytes_carried":${carried.values.sum},""" +
        f""""merge_sec":$secs%.2f}""")
      lsmLo += bs
    }
    docs.unpersist(blocking = false)
    spark.stop()
  }
}
