package graft

import graft.operators.ClusterCurate

/** Semantics the DuckDB oracle proves only pointwise: that the trained
  * clusters RECOVER the planted topics, that balance sampling obeys its
  * cap law, and that the outlier cut is the global bottom-k.
  */
class ClusterCurateSpec extends SparkSpec {

  test("cluster_topics recovers the planted topics with high purity") {
    try {
      val out = ClusterCurate.topics.run(spark, sf).collect()
      assert(out.length == ClusterCurate.K,
        s"expected ${ClusterCurate.K} clusters, got ${out.length}")
      // seeds 0..7 are one per planted topic; after Lloyd refinement each
      // cell's dominant topic must be its seed's topic, essentially pure
      out.foreach { r =>
        assert(r.getAs[Long]("dominant_label") == r.getAs[Long]("cell") % ClusterCurate.K,
          s"cell ${r.getAs[Long]("cell")} dominated by ${r.getAs[Long]("dominant_label")}")
        assert(r.getAs[Long]("purity_bp") >= 9000L,
          s"cell ${r.getAs[Long]("cell")} purity ${r.getAs[Long]("purity_bp")}")
      }
    } finally CacheRegistry.clear()
  }

  test("cluster_balance_sample obeys the cap law and keeps small clusters whole") {
    try {
      val out = ClusterCurate.balance.run(spark, sf).collect()
      val tot = out.map(_.getAs[Long]("n_total")).sum
      val cap = math.ceil(tot.toDouble / ClusterCurate.K).toLong
      out.foreach { r =>
        val (nTotal, keepBp, nKept) = (r.getAs[Long]("n_total"),
          r.getAs[Long]("keep_bp"), r.getAs[Long]("n_kept"))
        assert(nKept <= nTotal)
        assert(keepBp <= 10000L)
        // at or under the uniform cap -> keep everything
        if (nTotal <= cap) {
          assert(keepBp == 10000L, s"under-cap cluster throttled: $r")
          assert(nKept == nTotal)
        }
        // the hash is uniform: realized keep rate tracks keep_bp loosely
        if (keepBp < 10000L)
          assert(nKept < nTotal || keepBp > 9000L, s"over-cap cluster kept whole: $r")
      }
    } finally CacheRegistry.clear()
  }

  test("embed_outliers is the exact global bottom-k of the trained assignment") {
    try {
      val out = ClusterCurate.outliers.run(spark, sf).collect()
      assert(out.length == ClusterCurate.OutlierN)
      val costs = out.map(_.getAs[Long]("ccos_bp"))
      assert(costs.sameElements(costs.sorted), "outliers not ascending")
      // nothing outside the cut is more of an outlier than anything in it
      val maxOut = costs.max
      val full = ClusterCurate.trainedCells(spark, sf)
        .collect().map(_.getAs[Long]("ccos_bp"))
      val below = full.count(_ < maxOut)
      assert(below <= ClusterCurate.OutlierN,
        s"$below rows strictly below the cut's max $maxOut")
    } finally CacheRegistry.clear()
  }

  test("cluster_medoids is the per-cell top-3 by centroid cosine") {
    try {
      val out = ClusterCurate.medoids.run(spark, sf).collect()
      val byCell = out.groupBy(_.getAs[Long]("cell"))
      assert(byCell.size == ClusterCurate.K)
      byCell.foreach { case (cell, rows) =>
        assert(rows.length == ClusterCurate.MedoidN, s"cell $cell")
        val ranks = rows.map(_.getAs[Long]("rank")).sorted
        assert(ranks.sameElements(1L to ClusterCurate.MedoidN))
        val costs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("ccos_bp"))
        assert(costs.zip(costs.tail).forall { case (a, b) => a >= b },
          s"cell $cell medoids not descending")
      }
      // on the planted fixture, a cluster's best-centered members carry
      // its true topic
      out.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
        assert(r.getAs[Long]("true_label") == r.getAs[Long]("cell") % ClusterCurate.K)
      }
    } finally CacheRegistry.clear()
  }

  test("curation queries are deterministic across reruns") {
    try {
      val a = ClusterCurate.balance.run(spark, sf).collect().map(_.toString)
      // clearAll drops the SHARED trainedCells frame too (clear() leaves
      // shared entries alive, which would make run B a cache readback
      // instead of a retrain — vacuous)
      CacheRegistry.clearAll()
      val b = ClusterCurate.balance.run(spark, sf).collect().map(_.toString)
      assert(a.sameElements(b))
    } finally CacheRegistry.clearAll()
  }
}
