package graft

import graft.operators.PushRank
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The residual-push kernels' load-bearing law: the maintained residual
  * equals the from-scratch Bellman residual BIT-FOR-BIT after every
  * push round — full-sweep, thresholded, and with SIGNED residuals (the
  * repair scenario). Plus the contraction that makes pushing worthwhile
  * and the certificate's sanity.
  */
class PushRankSpec extends SparkSpec {
  import spark.implicits._

  /** 21-node deterministic graph: two out-edges per node 0..19 with
    * varied counts, node 20 dangling (in-edges only).
    */
  private def edges: DataFrame =
    (0L until 20L).flatMap { i =>
      Seq((i, (i * 3 + 1) % 20, 1L + i % 3), (i, (i * 7 + 2) % 20, 2L),
        (i, 20L, 1L))
    }.toDF("src", "dst", "n")

  private def nodes: DataFrame =
    (0L to 20L).map(Tuple1(_)).toDF("node")

  private def initState(pppm: DataFrame): DataFrame = {
    val outDeg = edges.groupBy(col("src")).agg(sum(col("n")).as("out_n"))
    val st0 = nodes
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("out_n"), lit(0L)).as("out_n"),
        lit(0L).as("p"))
    PushRank.bellmanResidual(st0, pppm)
  }

  private def asMap(df: DataFrame): Map[Long, (Long, Long)] =
    df.select("node", "p", "r").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("maintained residual == recomputed Bellman residual after every round") {
    val pppm = PushRank.transitions(edges).persist()
    var st = initState(pppm)
    (1 to 6).foreach { k =>
      val eps = if (k <= 3) 0L else 1000000L // full sweeps, then thresholded
      st = CacheRegistry.materialize(PushRank.pushRound(st, pppm, eps))
      val recomputed =
        PushRank.bellmanResidual(st.select("node", "out_n", "p"), pppm)
      assert(asMap(st) == asMap(recomputed),
        s"invariant broke after round $k (eps=$eps)")
    }
    CacheRegistry.clear()
  }

  test("full-sweep rounds contract the residual geometrically") {
    val pppm = PushRank.transitions(edges).persist()
    var st = initState(pppm)
    val masses = (1 to 8).map { _ =>
      st = CacheRegistry.materialize(PushRank.pushRound(st, pppm, 0L))
      PushRank.residualMass(st)
    }
    masses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"residual mass did not shrink: $masses")
    }
    // 8 damped rounds: well under d^8 of the injected mass
    assert(masses.last < PushRank.residualMass(initState(pppm)) / 3,
      s"residual barely moved: $masses")
    CacheRegistry.clear()
  }

  test("the invariant survives SIGNED residuals (the repair scenario)") {
    val pppm = PushRank.transitions(edges).persist()
    var st = initState(pppm)
    (1 to 3).foreach { _ =>
      st = CacheRegistry.materialize(PushRank.pushRound(st, pppm, 0L))
    }
    // perturb p as an edge-change repair would: mass shifted between
    // nodes — the recomputed residual turns signed
    val perturbed = st.select(col("node"), col("out_n"),
      (col("p") + when(col("node") === 3, lit(30000000000L))
        .when(col("node") === 7, lit(-10000000000L)).otherwise(lit(0L)))
        .as("p"))
    var rep = CacheRegistry.materialize(
      PushRank.bellmanResidual(perturbed, pppm))
    assert(rep.filter(col("r") < 0).count() > 0,
      "fixture failed to produce a signed residual")
    (1 to 4).foreach { k =>
      rep = CacheRegistry.materialize(PushRank.pushRound(rep, pppm, 0L))
      val recomputed =
        PushRank.bellmanResidual(rep.select("node", "out_n", "p"), pppm)
      assert(asMap(rep) == asMap(recomputed),
        s"signed invariant broke after round $k")
    }
    // and the repair converges: residual mass shrinks from the
    // perturbed baseline
    assert(PushRank.residualMass(rep) <
      PushRank.residualMass(PushRank.bellmanResidual(perturbed, pppm)),
      "repair pushes did not shrink the perturbed residual")
    CacheRegistry.clear()
  }
}
