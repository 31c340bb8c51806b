package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.SnapshotDiff
import graft.streaming.SearchStream
import org.apache.spark.sql.functions._

/** Phase timing for the maintained-search deployment
  * (`search_bm25_maintained`'s shape): per-batch ingest split into index
  * vs stat-fold time, plus the serve, at any sfDir and batch count —
  * the profile that decides where the query's wall time actually goes
  * and whether per-batch cost stays ∝ batch at the blowup fixtures.
  *
  * Usage: runMain graft.tools.SearchStreamProbe <sfDir> [nBatches]
  */
object SearchStreamProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("search-stream-probe")
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).persist()
    docs.count()
    val root = sys.props("java.io.tmpdir") + "/graft_ssprobe"
    SnapshotDiff.rmTree(root)

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val rootB = sys.props("java.io.tmpdir") + "/graft_ssprobe_idxonly"
    SnapshotDiff.rmTree(rootB)
    SearchStream.contiguousBatches(docs, nBatches).zipWithIndex.foreach {
      case (batch, b) =>
        val n = batch.count()
        val (_, iSec) = t(graft.operators.LsmIndex.applyDocBatch(
          batch, b + 1L, rootB, maxSegments = 2))
        val (_, sec) = t(SearchStream.applyBatch(batch, b + 1L, root,
          maxSegments = 2))
        println(f"""{"probe":"search_stream","phase":"ingest","batch":${b + 1},"docs":$n,"sec":$sec%.2f,"index_only_sec":$iSec%.2f}""")
    }
    val (out, sSec) = t(SearchStream.serve(spark, root).get.collect())
    println(f"""{"probe":"search_stream","phase":"serve","rows":${out.length},"sec":$sSec%.2f}""")
    val (warm, s2) = t(SearchStream.serve(spark, root).get.collect())
    println(f"""{"probe":"search_stream","phase":"serve_warm","rows":${warm.length},"sec":$s2%.2f}""")
    spark.stop()
  }
}
