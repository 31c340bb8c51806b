package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing for `embed_pc_drift` — splits the query into its three
  * ingest folds and four model reads so a wall-time anomaly can be
  * attributed (fold? read? solve?) instead of guessed at.
  *
  * Usage: `sbt "runMain graft.tools.DriftProbe <sfDir>"`
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.GraftSession.getOrCreate("drift-probe", "local[32]")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val root = "/tmp/graft_driftprobe"
    graft.operators.SnapshotDiff.rmTree(root)
    (0 to 2).foreach { k =>
      t(s"applyBatch ${k + 1}") {
        graft.streaming.PcaStream.applyBatch(
          emb.filter(pmod(col("vec_id"), lit(3)) === k), k + 1L, root)
      }
      if (k > 0) {
        t(s"modelAt v$k") {
          graft.streaming.PcaStream.modelAt(spark, root, s"v$k")
        }
        t(s"modelAt v${k + 1}") {
          graft.streaming.PcaStream.modelAt(spark, root, s"v${k + 1}")
        }
      }
    }
    spark.stop()
  }
}
