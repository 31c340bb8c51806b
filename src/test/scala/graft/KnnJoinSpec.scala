package graft

import org.apache.spark.sql.functions._
import graft.operators.KnnJoin

/** Structural invariants of the blocked k-NN self-join that the DuckDB
  * oracle proves only pointwise: every vector is a query, ranks are dense
  * 1..k, the audit sample reports honest recall, and majority voting is a
  * self-consistent function of the neighbor rows.
  */
class KnnJoinSpec extends SparkSpec {

  test("knn join emits dense ranks 1..3 with unique neighbors per query") {
    val rows = KnnJoin.knnJoin.run(spark, sf).collect()
    try {
      val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
      assert(byQuery.nonEmpty)
      byQuery.foreach { case (q, rs) =>
        val ranks = rs.map(_.getAs[Long]("rank")).sorted
        assert(ranks.sameElements(1L to ranks.length),
          s"query $q ranks not dense: ${ranks.mkString(",")}")
        val neigh = rs.map(_.getAs[Long]("neighbor_id"))
        assert(neigh.distinct.length === neigh.length, s"query $q repeated a neighbor")
        assert(!neigh.contains(q), s"query $q returned itself")
        // cos_bp non-increasing in rank
        val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("cos_bp"))
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
          s"query $q scores not ranked: ${byRank.mkString(",")}")
      }
      // near-total coverage: a query drops out only if its 2 probe cells
      // held no other vector, which can't happen for √n-sized cells at
      // this fixture (500 vectors, 23 cells)
      val n = operators.Similarity.vecs(spark, sf).count()
      assert(byQuery.size === n, s"expected $n queries, got ${byQuery.size}")
    } finally CacheRegistry.clear()
  }

  test("sampled recall audit is bounded and covers exactly the mod-17 queries") {
    val rec = KnnJoin.knnRecall.run(spark, sf).collect()
    try {
      assert(rec.nonEmpty)
      rec.foreach { r =>
        assert(r.getAs[Long]("query_id") % 17 === 0)
        val bp = r.getAs[Long]("recall_bp")
        assert(bp >= 0 && bp <= 10000, s"recall out of range: $bp")
        assert(r.getAs[Long]("truth_k") === 3)
      }
    } finally CacheRegistry.clear()
  }

  test("classifier prediction equals a recount of its own neighbor votes") {
    val knn = KnnJoin.knnRows(spark, sf)
    val labels = operators.Similarity.vecs(spark, sf)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val pred = KnnJoin.knnClassify.run(spark, sf).collect()
    try {
      val lblMap = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val votes = knn.collect()
        .map(r => (r.getAs[Long]("query_id"), lblMap(r.getAs[Long]("neighbor_id"))))
        .groupBy(identity).view.mapValues(_.length).toMap
      pred.foreach { p =>
        val q = p.getAs[Long]("vec_id")
        val expected = votes.collect { case ((`q`, l), c) => (l, c) }.toSeq
          .sortBy { case (l, c) => (-c, l) }.head
        assert(p.getAs[Long]("pred_label") === expected._1, s"query $q pred mismatch")
        assert(p.getAs[Long]("votes") === expected._2.toLong, s"query $q vote count")
        assert(p.getAs[Long]("correct") ===
          (if (expected._1 == lblMap(q)) 1L else 0L))
      }
    } finally CacheRegistry.clear()
  }
}
