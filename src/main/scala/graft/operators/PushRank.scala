package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch kernels for INCREMENTAL residual-push PageRank — the
  * algorithmic half of PLANS.md's "incremental residual-push rank
  * repair" design, landed ahead of the streaming wrapper so the
  * operator math is spec-proven before any state machinery wraps it.
  *
  * Operator: the PER-EDGE-FLOOR damped transition
  * `T(x)(v) = Σ_u (d·((x(u)·p_ppm(u,v)) div 1e6)) div 100 + gterm`
  * (two-stage floor — `d·p·ppm` alone can exceed Long range at full
  * mass; `p·ppm ≤ 1e18` stays exact), with
  * `gterm = (d·(dang div nn)) div 100` uniform across nodes — every
  * term floors ALONE, which is what makes a single edge change alter
  * exactly one summand (delta-decomposability, the property the batch
  * query's outer `div 100` lacks) and the dangling/teleport scalars
  * uniform (the lazy-shift trick). Differs from [[Graph.pagerank]]'s
  * operator by floor placement only — the incremental twin certifies
  * against ITS OWN fixpoint.
  *
  * Invariant maintained everywhere: r = b + T(p) − p (the BELLMAN
  * residual of value vector p), so ‖p* − p‖₁ ≤ ‖r‖₁ · 100/(100 − d)
  * is a live error certificate, and a PUSH — p(v) += r(v) on active
  * nodes — contracts the residual geometrically (the Gauss-Southwell /
  * bookmark-coloring step, Berkhin 2006, batched over the active set).
  *
  * All integer fixed-point (10⁻¹² mass units), deterministic under any
  * partitioning.
  */
object PushRank {

  private val Mass = 1000000000000L
  private val Damp = Graph.Damp

  /** (src, dst, p_ppm) from (src, dst, n) edge counts. */
  private[graft] def transitions(edges: DataFrame): DataFrame = {
    val outDeg = edges.groupBy(col("src")).agg(sum(col("n")).as("out_n"))
    edges.join(outDeg, "src")
      .withColumn("p_ppm", expr("(n * 1000000) div out_n"))
      .select("src", "dst", "p_ppm")
  }

  /** The uniform teleport share b per node: ((100−d)·M) div (100·nn). */
  private[graft] def bOf(nn: Long): Long =
    ((100L - Damp) * Mass) / (100L * nn)

  /** The uniform dangling share: (d·(dang div nn)) div 100. */
  private[graft] def gtermOf(dang: Long, nn: Long): Long =
    (Damp * (dang / nn)) / 100L

  /** Bellman residual of `state(node, out_n, p)` over `p_ppm(src, dst,
    * p_ppm)`: r(v) = b + T(p)(v) − p(v) under the per-edge operator.
    * One join + one aggregation — the from-scratch derivation the
    * maintained-residual law is checked against (and the init path:
    * p = 0 gives r = b per node).
    */
  private[graft] def bellmanResidual(state: DataFrame,
      pppm: DataFrame): DataFrame = {
    val nnDang = state.agg(count(lit(1)).as("nn"),
      coalesce(sum(when(col("out_n") === 0, col("p"))), lit(0L)).as("dang"))
      .collect().head
    val nn = nnDang.getLong(0)
    val dang = nnDang.getLong(1)
    require(nn > 0, "push_rank: empty node set")
    val contrib = pppm
      .join(state.select(col("node"), col("p")),
        pppm("src") === col("node"))
      .withColumn("part",
        expr(s"($Damp * ((p * p_ppm) div 1000000)) div 100"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("part")).as("c"))
    state.join(contrib, Seq("node"), "left")
      .select(col("node"), col("out_n"), col("p"),
        (lit(bOf(nn)) + coalesce(col("c"), lit(0L)) +
          lit(gtermOf(dang, nn)) - col("p")).as("r"))
  }

  /** One SYNCHRONIZED threshold-push round over `state(node, out_n, p,
    * r)`: every node with |r| > eps moves its whole residual into its
    * value (p += r, r ← 0 locally), and the change re-enters neighbors'
    * residuals as the EXACT per-edge delta — the operator's term
    * evaluated at p_new MINUS at p_old, because a floor does not split
    * over a value increment (a `Δp`-based term would drift the
    * invariant by one unit per edge per round). The uniform gterm re-enters as the before/after
    * difference of the TOTAL dangling mass, for the same reason. With
    * both deltas exact, the Bellman invariant r = b + T(p) − p is
    * preserved BIT-FOR-BIT through every round — the law
    * `PushRankSpec` pins against [[bellmanResidual]]'s from-scratch
    * recompute. Signed residuals push symmetrically (the repair case
    * after edge deletions/rescales). Cost ∝ active set and its
    * out-edges; at ε = 0 with every node active this is one full
    * iteration.
    */
  private[graft] def pushRound(state: DataFrame, pppm: DataFrame,
      eps: Long): DataFrame = {
    val nn = state.count()
    require(nn > 0, "push_rank: empty node set")
    val active = state.filter(abs(col("r")) > eps)
      .select(col("node").as("src"), col("p").as("p_old"),
        (col("p") + col("r")).as("p_new"), col("out_n").as("a_out"))
    val deltas = pppm.join(active, "src")
      .withColumn("dr",
        expr(s"($Damp * ((p_new * p_ppm) div 1000000)) div 100" +
          s" - ($Damp * ((p_old * p_ppm) div 1000000)) div 100"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("dr")).as("dr"))
    val dangRow = state.filter(col("out_n") === 0)
      .agg(coalesce(sum(col("p")), lit(0L)).as("before"),
        coalesce(sum(when(abs(col("r")) > eps, col("p") + col("r"))
          .otherwise(col("p"))), lit(0L)).as("after"))
      .collect().head
    val gShift =
      gtermOf(dangRow.getLong(1), nn) - gtermOf(dangRow.getLong(0), nn)
    state
      .withColumn("p",
        when(abs(col("r")) > eps, col("p") + col("r")).otherwise(col("p")))
      .withColumn("r",
        when(abs(col("r")) > eps, lit(0L)).otherwise(col("r")))
      .join(deltas, Seq("node"), "left")
      .select(col("node"), col("out_n"),
        col("p"), (col("r") + coalesce(col("dr"), lit(0L)) + lit(gShift))
          .as("r"))
  }

  /** ‖r‖₁ of a state frame — the live certificate. */
  private[graft] def residualMass(state: DataFrame): Long =
    state.agg(coalesce(sum(abs(col("r"))), lit(0L)))
      .collect().head.getLong(0)
}
