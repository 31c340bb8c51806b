package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Similarity, SnapshotDiff}
import graft.streaming.AnnStream
import org.apache.spark.sql.functions._

/** Phase attribution for the maintained-IVF twin at a given fixture:
  * per-batch ingest cost (assignment + fold — should scale with the
  * BATCH, not the table) and serve cost (centroid rank + probed-cell
  * tile reads — should stay candidate-proportional as the corpus
  * grows). One JSON line per batch plus a serve line. Run across
  * sf0.001 / sf0.01 / sf0.1 (or blown-up fixtures) to read the scaling.
  *
  * Usage: `sbt "runMain graft.tools.AnnStreamProbe <sfDir> [nBatches]"`
  */
object AnnStreamProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession.getOrCreate("ann-stream-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = Similarity.vecs(spark, sfDir).persist()
    val n = e.count()
    val root = SnapshotDiff.scratchRoot("annprobe", sfDir)
    SnapshotDiff.rmTree(root)
    val Array(mn, mx) = e.agg(min(col("vec_id")), max(col("vec_id")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    val span = mx - mn + 1
    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    (0 until nBatches).foreach { b =>
      val batch = e.filter(col("vec_id") >= mn + b * span / nBatches &&
        col("vec_id") < mn + (b + 1) * span / nBatches)
      val rows = batch.count()
      val (sec, _) = time(AnnStream.applyBatch(batch, b + 1L, root))
      println(s"""{"sf":"$sfDir","corpus":$n,"batch":${b + 1},""" +
        s""""batch_rows":$rows,"ingest_sec":$sec}""")
    }
    val queries = e.filter(col("vec_id") < 10)
    val (serve1, df1) = time(
      AnnStream.serve(spark, root, queries).get.collect())
    val (serve2, _) = time(
      AnnStream.serve(spark, root, queries).get.collect())
    println(s"""{"sf":"$sfDir","corpus":$n,"serve_rows":${df1.length},""" +
      s""""serve_sec_run1":$serve1,"serve_sec_run2":$serve2}""")
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
