package graft.tools

import graft.GraftSession
import graft.operators.EmbedPca
import org.apache.spark.sql.functions._

/** Measures the spectral family's d-CEILING: the scatter pass is
  * n·d(d+1)/2 exploded cells, the driver eigen-solve is O(d²) BigInt per
  * power iteration, and the maintained moment table holds 1+d+d(d+1)/2
  * rows — all fine at d=64, but nothing was measured past it. This probe
  * times, per width d ∈ {64, 256, 512, 1024} over a deterministic
  * synthetic corpus of n floored vectors:
  *
  *  - `stats_sec`: the distributed scatter pass (collectStats — the n·d²
  *    explode + partial agg + d²/2-cell collect);
  *  - `solve_sec`: the driver BigInt solve (solveFromStats — 4 power
  *    iterations over the d² dense matrix);
  *  - `fold_sec`: one PcaStream.applyBatch delta fold into a fresh
  *    maintained table (the per-batch streaming cost);
  *  - `serve_sec`: modelAt off the maintained table (read d²/2 rows +
  *    driver solve).
  *
  * One JSON line per d. Usage:
  *   `sbt "runMain graft.tools.DimCeilingProbe <n> <d1,d2,...>"`
  */
object DimCeilingProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 500
    val dims = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(64, 256, 512, 1024)
    val spark = GraftSession.getOrCreate("dim-ceiling-probe")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    dims.foreach { d =>
      // deterministic synthetic coords in [-1, 1) (murmur hash, no RNG);
      // BOTH the batch solve and the stream fold go through the ONE
      // canonical floor (floorSql) so their integer domains are
      // identical by construction
      val emb = spark.range(n).select(expr(
        s"transform(sequence(1, $d), j -> " +
          s"CAST(pmod(hash(id * $d + j), 2000) - 1000 AS DOUBLE) / 1000.0)")
        .as("embedding")).persist()
      emb.count()
      val fx = emb.select(expr(EmbedPca.floorSql).as("fx")).persist()
      fx.count()
      val (statsSec, (nn, sx, tri)) = time(EmbedPca.collectStats(fx))
      val (solveSec, model) = time(EmbedPca.solveFromStats(nn, sx, tri))
      val root = graft.operators.SnapshotDiff.scratchRoot("dimprobe", s"d$d")
      graft.operators.SnapshotDiff.rmTree(root)
      val (foldSec, _) =
        time(graft.streaming.PcaStream.applyBatch(emb, 1L, root))
      val (serveSec, served) =
        time(graft.streaming.PcaStream.modelAt(spark, root, "v1"))
      val ok = served.v.sameElements(model.v)
      emb.unpersist(blocking = false)
      fx.unpersist(blocking = false)
      graft.CacheRegistry.clear()
      println(s"""{"d":$d,"n":$n,"tri_cells":${tri.length},""" +
        s""""stats_sec":$statsSec,"solve_sec":$solveSec,""" +
        s""""fold_sec":$foldSec,"serve_sec":$serveSec,""" +
        s""""served_equals_batch":$ok}""")
    }
    spark.stop()
  }
}
