package graft

import graft.operators.{Similarity, SnapshotDiff}
import graft.sources.SnapshotTable
import graft.streaming.AnnStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[AnnStream.recluster]]'s law: the published re-cluster IS the index
  * you would rebuild from scratch under the post-Lloyd model — the
  * serve off the reclustered table equals the relational probe computed
  * directly from [[Similarity.lloydCenters]]' refined centroids, the
  * stored model rows equal those centroids, the `g:` counters equal the
  * re-assignment's per-cell counts, a replayed recluster short-circuits,
  * and ingest continues across the boundary.
  */
class AnnReclusterSpec extends SparkSpec {
  import spark.implicits._

  private def ingest(root: String): DataFrame = {
    val e = Similarity.vecs(spark, sf)
    SnapshotDiff.rmTree(root)
    val Array(mn, mx) = e.agg(min(col("vec_id")), max(col("vec_id")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val span = mx - mn + 1
    (0 until 3).foreach { b =>
      AnnStream.applyBatch(
        e.filter(col("vec_id") >= mn + b * span / 3 &&
          col("vec_id") < mn + (b + 1) * span / 3), b + 1L, root)
    }
    e
  }

  /** The rebuild side: relational top-2-probe/top-3 serve under explicit
    * centroids — [[Similarity.cellRanked]] over the full corpus, scored
    * per probe cell (the ann_ivf shape with the model swapped in).
    */
  private def rebuildServe(e: DataFrame, cents: DataFrame): Seq[(Long, Long, Long, Long)] = {
    val ranked = Similarity.cellRanked(
      e.select(col("vec_id"), col("v"), col("nrm")), cents)
    val corpus = ranked.filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
    val probe = ranked.filter(col("crank") <= 2 && col("vec_id") < 10)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
    val w = Window.partitionBy(col("q.vec_id"))
      .orderBy(col("cos_bp").desc, col("c.vec_id"))
    probe.as("q")
      .join(corpus.as("c"),
        col("q.cell") === col("c.cell") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_bp", Similarity.cosBp("q", "c"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("q.vec_id"), col("c.vec_id"), col("rank").cast("long"),
        col("cos_bp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
  }

  test("recluster: serve ≡ rebuild, model/counters exact, replay-safe") {
    val root = SnapshotDiff.scratchRoot("annreclspec", sf)
    val e = ingest(root)
    AnnStream.recluster(spark, root, 4L)
    assert(SnapshotTable.latestVersion(root).contains("v4"))
    // the expected post-Lloyd model: one Lloyd step from the pinned
    // first-batch seeds over the same corpus
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val (expCents0, _) = Similarity.lloydCenters(
      e.select(col("vec_id"), col("v"), col("nrm")), seeds, 1)
    val expCents = expCents0.persist()
    // stored model rows == the refined centroids (cid, cv, cnrm)
    val stored = SnapshotTable.read(spark, root).get
      .filter(col("sk").startsWith("m:"))
      .select(col("vec_id").as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val sm = stored.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    val em = expCents.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(sm == em, "stored model != post-Lloyd centroids")
    // serve off the reclustered table == the relational rebuild
    val served = AnnStream.serve(spark, root,
        e.filter(col("vec_id") < 10)).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(served == rebuildServe(e, expCents),
      "serve after recluster != rebuild under the post-Lloyd model")
    // g: counters == the re-assignment's per-cell counts
    val counters = AnnStream.cellBalance(spark, root).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expCounts = Similarity.cellRanked(
        e.select(col("vec_id"), col("v"), col("nrm")), expCents)
      .filter(col("crank") === 1)
      .groupBy(col("cid")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counters == expCounts, "g: counters != re-assignment counts")
    // replay short-circuits (head unchanged, no error)
    AnnStream.recluster(spark, root, 4L)
    assert(SnapshotTable.latestVersion(root).contains("v4"))
    // ingest continues across the boundary under the NEW model
    val extra = e.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"), col("nrm"))
    AnnStream.applyBatch(extra, 5L, root)
    assert(SnapshotTable.latestVersion(root).contains("v5"))
    val after = AnnStream.cellBalance(spark, root).get
      .agg(sum(col("postings"))).collect().head.getLong(0)
    assert(after == expCounts.values.sum + 5,
      "post-recluster fold did not extend the counters")
    expCents.unpersist(blocking = false)
    CacheRegistry.clear()
  }
}
