package graft.tools

import graft.GraftSession
import graft.operators.{Behavior, Graph, SnapshotDiff}
import graft.streaming.RankStream
import org.apache.spark.sql.functions._

/** Scale probe for the periodic-publication streaming-rank contract
  * (round-11: `rankEveryK`). The claim: with the rank rebuild amortized
  * to every K-th batch, a NON-PUBLISHING batch's cost is ∝ the batch —
  * roughly flat as the corpus grows — because the edge fold's join is
  * batch-sized on both sides (tile-pruned previous counts). The rank
  * REBUILD batch stays ∝ corpus by contract (exact iterations from
  * uniform); what the knob buys is paying it 1/K of the time.
  *
  * Protocol: bulk-load the corpus's page-transition edges as batch 1
  * (rankEveryK high → no rank publish), then time three small held-out
  * batches (~1k pairs each, persisted before the clock starts) through
  * `applyBatch` — fold-only — and finally one publishing batch. JSON
  * lines: corpus edge rows, per-small-batch seconds, publish seconds.
  *
  * Usage: `sbt "runMain graft.tools.RankPeriodicProbe <sfDir>"`;
  * BASELINE.md records sf0.1 / 10x / 100x captures.
  */
object RankPeriodicProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.getOrCreate("rank-periodic-probe")
    spark.sparkContext.setLogLevel("WARN")

    val ev = Graph.pageEvents(spark, sfDir)
    val pairs = Behavior.sessionPairs(ev, "page").select("src", "dst")
      .persist()
    val dir = sys.props("java.io.tmpdir") + "/graft_rankprobe"
    SnapshotDiff.rmTree(dir)
    val (edgeRoot, rankRoot) = (s"$dir/edges", s"$dir/ranks")

    // bulk: everything except a small deterministic holdout
    val holdKey = pmod(hash(col("src") * 31 + col("dst")), lit(1000))
    val bulk = pairs.filter(holdKey >= 4)
    val t0 = System.nanoTime()
    RankStream.applyBatch(bulk, 1L, edgeRoot, rankRoot,
      iters = 5, rankEveryK = 1000)
    val bulkSecs = (System.nanoTime() - t0) / 1e9
    val edgeRows = graft.sources.SnapshotTable.read(spark, edgeRoot).get.count()
    println(f"""{"probe":"rank_periodic","step":"bulk","edge_rows":$edgeRows,"sec":$bulkSecs%.2f}""")
    graft.CacheRegistry.clear()

    // three fold-only batches (batchId % 1000 != 0 → no rank rebuild)
    (0 until 3).foreach { k =>
      val batch = pairs.filter(holdKey === k).persist()
      val n = batch.count() // materialize before the clock
      val t1 = System.nanoTime()
      RankStream.applyBatch(batch, k.toLong + 2, edgeRoot, rankRoot,
        iters = 5, rankEveryK = 1000)
      val secs = (System.nanoTime() - t1) / 1e9
      println(f"""{"probe":"rank_periodic","step":"fold","batch_pairs":$n,"sec":$secs%.2f}""")
      batch.unpersist(blocking = false)
      graft.CacheRegistry.clear()
    }

    // one publishing batch: the corpus-proportional cost paid 1/K of the time
    val last = pairs.filter(holdKey === 3).persist()
    val n = last.count()
    val t2 = System.nanoTime()
    RankStream.applyBatch(last, 1000L, edgeRoot, rankRoot,
      iters = 5, rankEveryK = 1000)
    val secs = (System.nanoTime() - t2) / 1e9
    println(f"""{"probe":"rank_periodic","step":"publish","batch_pairs":$n,"sec":$secs%.2f}""")
    spark.stop()
  }
}
