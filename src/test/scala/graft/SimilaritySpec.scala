package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** k-means internals the DuckDB oracle proves only pointwise: that Lloyd
  * refinement actually LIFTS recall on clustered data, and that the
  * iteration loop stops at convergence instead of running its cap.
  */
class SimilaritySpec extends SparkSpec {

  test("Lloyd refinement lifts recall@3 over boundary seeds on the planted clusters") {
    val out = Similarity.ivfKmeansGain.run(spark, sf).collect()
    try {
      val seeded = out.map(_.getAs[Long]("seeded_recall_bp")).sum
      val refined = out.map(_.getAs[Long]("refined_recall_bp")).sum
      assert(refined > seeded,
        s"refinement did not lift recall: refined=$refined seeded=$seeded")
      // the boundary seeds split every cluster across two cells, so the
      // seeded path must be materially below the refined ceiling
      assert(seeded < out.length * 10000L)
    } finally CacheRegistry.clear()
  }

  test("lloyd loop stops on convergence, well before the iteration cap") {
    val e = Similarity.clusteredVecs(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val (_, ran) = Similarity.lloydCenters(e, seeds, 20)
    try assert(ran < 20, s"lloyd ran the full cap ($ran) without converging")
    finally CacheRegistry.clear()
  }

  test("prefix recall: the full-width row is the built-in self-check at exactly 10000") {
    val out = SparkEntry.queries("ann_prefix_recall")(spark, sf).collect()
    try {
      val widths = out.map(_.getAs[Long]("prefix_dims")).distinct.sorted.toSeq
      assert(widths == Seq(8L, 16L, 32L, 64L), s"width panel: $widths")
      // w = 64 IS the full ranking (slice of full = full, ties included):
      // recall must be exactly 10000 for every query — the structural law
      // that proves the prefix machinery ranks like the truth pass
      val full = out.filter(_.getAs[Long]("prefix_dims") == 64L)
      assert(full.nonEmpty &&
        full.forall(_.getAs[Long]("recall_bp") == 10000L),
        s"full-width recall must be exact: ${full.map(_.toSeq).toSeq}")
      // 10 queries per width, truth_k = 3 each
      assert(out.length == 4 * full.length,
        s"every width scores the same panel: ${out.length}")
      assert(out.forall(_.getAs[Long]("truth_k") == 3L))
    } finally CacheRegistry.clearAll()
  }
}
