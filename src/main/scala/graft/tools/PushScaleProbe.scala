package graft.tools

import graft.GraftSession
import graft.streaming.PushStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the INCREMENTAL residual-push wrapper
  * ([[PushStream]]) — the flat-publish capture the round-12 directive
  * asked for. The claim: once the maintained state has drained below the
  * push threshold, a small edge batch's repair cost is ∝ the batch's
  * graph neighborhood (touched sources' out-edges + the push frontier it
  * seeds), NOT ∝ the corpus — the property the periodic-publish contract
  * ([[graft.streaming.RankStream]], rank rebuild ∝ corpus/K) cannot
  * offer. The contrast column measures exactly that rebuild on the same
  * graph.
  *
  * Protocol, per corpus scale S (10x steps): synthesize a deterministic
  * S-node / ~3S-edge graph (the PushRankSpec fixture's shape scaled up),
  * bulk-load it as batch 1, drain with an empty-delta batch (high round
  * budget — exits on the drained frontier), then time (a) one
  * FIXED-SIZE delta batch (300 edges over 100 sources — identical at
  * every scale) through [[PushStream.applyBatch]], and (b) one exact
  * 5-iteration rank rebuild over the full edge table (the periodic
  * contract's publish step). Tile COUNT scales with S so tile SIZE
  * stays fixed — the deployment shape (a fixed file count would make
  * every tile rewrite ∝ corpus and mask the result).
  *
  * JSON lines per scale: corpus rows, drain rounds' residual mass,
  * push-repair seconds, rebuild seconds.
  *
  * Usage: `sbt "runMain graft.tools.PushScaleProbe [maxScale]"`;
  * BASELINE.md records the 1x/10x/100x capture.
  */
object PushScaleProbe {

  private val Eps = 10000L
  private val DeltaSrcs = 100L
  private val EdgesPerNode = 2

  /** Deterministic scaled graph: node i → (i·3+1) % S (count 1 + i%3)
    * and (i·7+2) % S (count 2) — the PushRankSpec shape without the
    * dangling sink (dangling flips are spec-covered; the probe measures
    * cost, not corner semantics).
    */
  private def corpus(spark: SparkSession, s: Long): DataFrame = {
    spark.range(s).selectExpr(
        "id AS src",
        s"array(struct((id * 3 + 1) % $s AS dst, 1 + id % 3 AS n), " +
          s"struct((id * 7 + 2) % $s AS dst, CAST(2 AS BIGINT) AS n)) AS es")
      .select(col("src"), explode(col("es")).as("e"))
      .select(col("src"), col("e.dst").as("dst"), col("e.n").as("n_d"))
  }

  /** The fixed probe delta: 300 new edges from 100 sources spread
    * across the id space, each to a far neighbor — identical row count
    * at every scale.
    */
  private def delta(spark: SparkSession, s: Long): DataFrame = {
    val stride = s / DeltaSrcs
    spark.range(DeltaSrcs).selectExpr(
        s"id * $stride AS src",
        s"array((id * $stride + 11) % $s, (id * $stride + 23) % $s, " +
          s"(id * $stride + 37) % $s) AS ds")
      .select(col("src"), explode(col("ds")).as("dst"),
        lit(1L).as("n_d"))
  }

  def main(args: Array[String]): Unit = {
    val maxScale = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.getOrCreate("push-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    var s = maxScale / 100
    while (s <= maxScale) {
      val rt = PushStream.roots(
        sys.props("java.io.tmpdir") + s"/graft_pushprobe_$s")
      Seq(rt.edges, rt.state, rt.scalars)
        .foreach(graft.operators.SnapshotDiff.rmTree)
      val files = math.max(8, (s / 25000).toInt) // fixed tile SIZE
      val bulk = corpus(spark, s).persist()
      bulk.count()
      val t0 = System.nanoTime()
      PushStream.applyBatch(bulk, 1L, rt, Eps, rounds = 3,
        clusterFiles = files)
      val bulkSec = (System.nanoTime() - t0) / 1e9
      bulk.unpersist(blocking = false)
      // drain: empty-delta batch with a round budget high enough that
      // the frontier empties (applyBatch exits on drain)
      val empty = spark.range(0).select(col("id").as("src"),
        col("id").as("dst"), col("id").as("n_d"))
      val t1 = System.nanoTime()
      PushStream.applyBatch(empty, 2L, rt, Eps, rounds = 60,
        clusterFiles = files)
      val drainSec = (System.nanoTime() - t1) / 1e9
      val massDrained = PushStream.residualMass(spark, rt).get
      // the measured step: fixed-size delta repair
      val d = delta(spark, s).persist()
      val dRows = d.count()
      val t2 = System.nanoTime()
      PushStream.applyBatch(d, 3L, rt, Eps, rounds = 3,
        clusterFiles = files)
      val pushSec = (System.nanoTime() - t2) / 1e9
      d.unpersist(blocking = false)
      val massAfter = PushStream.residualMass(spark, rt).get
      // contrast: the periodic contract's publish step — one exact
      // 5-iteration rebuild over the full maintained edge table
      val edges = graft.sources.SnapshotTable.read(spark, rt.edges).get
        .filter(col("n") > 0).select(col("src"), col("dst"), col("n"))
      val nodes = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
      val t3 = System.nanoTime()
      graft.operators.Graph.pagerank(nodes, edges, 5).count()
      val rebuildSec = (System.nanoTime() - t3) / 1e9
      println(f"""{"probe":"push_scale","corpus_nodes":$s,"corpus_edges":${s * EdgesPerNode}%d,"tiles":$files,"bulk_sec":$bulkSec%.2f,"drain_sec":$drainSec%.2f,"residual_mass_drained":$massDrained,"delta_edges":$dRows,"push_repair_sec":$pushSec%.2f,"residual_mass_after":$massAfter,"rebuild_sec":$rebuildSec%.2f}""")
      graft.CacheRegistry.clear()
      Seq(rt.edges, rt.state, rt.scalars)
        .foreach(graft.operators.SnapshotDiff.rmTree)
      s = s * 10
    }
    spark.stop()
  }
}
