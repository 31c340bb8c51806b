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
}
