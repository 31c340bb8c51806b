package graft

import org.apache.spark.sql.functions._

/** Dedup internals that the DuckDB oracle can't see: the ROUND COUNT of
  * the connected-components label propagation. The oracle proves the final
  * labels; this spec proves the logarithmic convergence that makes the
  * operator viable on a deep duplication chain at corpus scale.
  */
class DedupSpec extends SparkSpec {

  private def chainEdges(ids: Seq[(Long, Long)]) = {
    import spark.implicits._
    val e = ids.toDF("doc_a", "doc_b")
    e.unionByName(e.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
  }

  test("path doubling closes a 50-link chain in ≤ ⌈log₂ d⌉+1 rounds") {
    // worst case for plain min-label propagation: a single path graph,
    // diameter 50 → 50 rounds without doubling
    val d = 50
    val edges = chainEdges((0L until d.toLong).map(i => (i, i + 1)))
    val (labels, rounds) = operators.Dedup.propagateLabels(edges)
    try {
      val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.size == d + 1)
      assert(out.values.forall(_ == 0L), "every chain node must label to the min id")
      val bound = math.ceil(math.log(d.toDouble) / math.log(2.0)).toInt + 1
      assert(rounds <= bound, s"took $rounds rounds, bound is $bound (diameter $d)")
    } finally CacheRegistry.clear()
  }

  test("propagation equals in-memory union-find on random graphs") {
    // seeded random graphs: the distributed algorithm must agree with a
    // plain union-find on every component, not just chains
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val nodes = 60
      val edgeList = (0 until 70).map { _ =>
        (rnd.nextInt(nodes).toLong, rnd.nextInt(nodes).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val parent = Array.tabulate(nodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edgeList.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edgeList.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = touched.map(n => n -> {
        // union-find root is not necessarily the component min; recompute
        val root = find(n.toInt)
        touched.filter(m => find(m.toInt) == root).min
      }).toMap
      val (labels, _) = operators.Dedup.propagateLabels(chainEdges(edgeList))
      try {
        val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial: mismatch ${(got.toSet diff expected.toSet).take(3)}")
      } finally CacheRegistry.clear()
    }
  }

  test("propagation keeps components separate") {
    val edges = chainEdges(
      (0L until 5L).map(i => (i, i + 1)) ++ (100L until 108L).map(i => (i, i + 1)))
    val (labels, _) = operators.Dedup.propagateLabels(edges)
    try {
      val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L to 5L).forall(out(_) == 0L))
      assert((100L to 108L).forall(out(_) == 100L))
    } finally CacheRegistry.clear()
  }

  test("cluster report histogram is exactly the labels' size distribution") {
    val labels = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
    CacheRegistry.clear()
    val report = SparkEntry.queries("dedup_cluster_report")(spark, sf).collect()
    CacheRegistry.clear()
    assert(report.nonEmpty, "sf0.001 plants near-dup pairs; report must see them")
    val expected = labels.groupBy(_.getLong(1)).values.map(_.length.toLong)
      .groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    val got = report.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"histogram must match the labels' distribution: $got vs $expected")
    report.foreach { r =>
      assert(r.getLong(0) >= 2L, s"singletons never enter the pair graph: $r")
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1), s"docs arithmetic: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1),
        s"removed = docs - keepers: $r")
    }
  }
}
