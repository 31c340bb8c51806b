package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Exact-arithmetic PageRank against an independent reimplementation of
  * the integer recurrence, plus dangling-node and determinism pins.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Mass = 1000000000000L

  /** The documented recurrence, replayed in plain Scala over adjacency
    * maps — an independent twin of both the Spark plan and the oracle.
    */
  private def reference(nodes: Seq[Long], edges: Map[(Long, Long), Long],
      iters: Int, seeds: Set[Long] = Set.empty): Map[Long, Long] = {
    val seedSet = if (seeds.isEmpty) nodes.toSet else seeds
    val ns = seedSet.size
    val out = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p = edges.map { case ((u, v), n) => (u, v) -> (n * 1000000L) / out(u) }
    val nn = nodes.size
    var r = nodes.map(_ -> Mass / nn).toMap
    (1 to iters).foreach { _ =>
      val dang = nodes.filterNot(out.contains).map(r).sum
      val contrib = nodes.map { v =>
        v -> p.collect { case ((u, d), ppm) if d == v => (r(u) * ppm) / 1000000L }.sum
      }.toMap
      val d = Graph.Damp
      r = nodes.map { v =>
        val s = if (seedSet(v)) 1L else 0L
        v -> (s * (((100 - d) * Mass) / (100L * ns)) +
          (d * (contrib(v) + s * (dang / ns))) / 100)
      }.toMap
    }
    r
  }

  test("pagerank matches the integer recurrence, dangling mass included") {
    // 1→2 twice, 2→1 once, 3 dangling (no out-edges)
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 2L), (2L, 1L, 1L)).toDF("src", "dst", "n")
    val got = Graph.pagerank(nodes, edges, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = reference(Seq(1L, 2L, 3L),
      Map((1L, 2L) -> 2L, (2L, 1L) -> 1L), 5)
    assert(got === want)
    // dangling node keeps only the base + redistributed mass; the linked
    // pair rank strictly above it
    assert(got(1L) > got(3L) && got(2L) > got(3L))
    CacheRegistry.clear()
  }

  test("a page with more in-mass outranks one with less") {
    // hub 1 links to 2 nine times and to 3 once
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "n")
    val got = Graph.pagerank(nodes, edges, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(2L) > got(3L))
    assert(got === reference(Seq(1L, 2L, 3L),
      Map((1L, 2L) -> 9L, (1L, 3L) -> 1L, (2L, 1L) -> 1L, (3L, 1L) -> 1L), 5))
    CacheRegistry.clear()
  }

  test("personalized teleport concentrates mass near the seed") {
    // symmetric 3-cycle; seeding node 1 must rank it above 2 and 3, and
    // the exact trajectory must match the seeded reference recurrence
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "n")
    val got = Graph.pagerank(nodes, edges, 5, Some(Seq(1L).toDF("node")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === reference(Seq(1L, 2L, 3L),
      Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (3L, 1L) -> 1L), 5, Set(1L)))
    assert(got(1L) > got(2L) && got(1L) > got(3L),
      s"seed must outrank the symmetric peers: $got")
    CacheRegistry.clear()
  }

  test("an edge-free graph (all dangling) converges to uniform ranks") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "n")
    val got = Graph.pagerank(nodes, edges, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got.values.toSet.size === 1, s"ranks must be uniform: $got")
    assert(got === reference(Seq(1L, 2L, 3L, 4L), Map.empty, 5))
    CacheRegistry.clear()
  }

  test("pageEdges honors the session gap and event-id tiebreak") {
    val base = 1700000000000000000L
    val gap = 31L * 60 * 1000 * 1000 * 1000 // > 30 min → severed
    val ev = Seq(
      (1L, 1L, base, 10L), // user 1: 10 → 20 within gap
      (1L, 2L, base + 1000L, 20L),
      (1L, 3L, base + 1000L + gap, 30L), // 20 -x-> 30 (session break)
      (2L, 4L, base, 40L), (2L, 5L, base, 41L) // same ts → event_id order
    ).toDF("user_id", "event_id", "tsn", "page")
    val got = Graph.pageEdges(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((10L, 20L) -> 1L, (40L, 41L) -> 1L))
  }
}
