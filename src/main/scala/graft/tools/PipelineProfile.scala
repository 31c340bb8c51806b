package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame

/** Per-stage wall-time profile of the composed pipeline
  * ([[graft.operators.PipelineManifest.survivors]]): counts each staged
  * frame as it is produced, so the printed deltas attribute cost to the
  * stage that actually incurred it (the boundary persists make later
  * stages read, not recompute, earlier ones).
  *
  * Usage: `sbt "runMain graft.tools.PipelineProfile [sfDir]"`
  */
object PipelineProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.getOrCreate("pipeline-profile")
    spark.sparkContext.setLogLevel("WARN")
    // untimed shared-frame warmup (the Bench contract): the pass-2 deltas
    // then measure the query's OWN per-run cost, the number the in-suite
    // min-of-2 reflects
    graft.operators.Warmup.sharedFrames(spark, sfDir)

    def pass(label: String): Unit = {
      val t0 = System.nanoTime()
      var last = t0
      val hook: (String, DataFrame) => DataFrame = { (name, df) =>
        val out = name match {
          case "dedup" | "quality" => graft.CacheRegistry.materialize(df)
          case _ => df
        }
        val n = out.count()
        val now = System.nanoTime()
        println(f"[pipeline-profile] $label $name%-8s rows=$n%-7d +${(now - last) / 1e9}%6.2f s  total ${(now - t0) / 1e9}%6.2f s")
        last = now
        out
      }
      val fin = graft.operators.PipelineManifest.survivors(spark, sfDir, hook)
      val n = fin.count()
      val now = System.nanoTime()
      println(f"[pipeline-profile] $label final    rows=$n%-7d +${(now - last) / 1e9}%6.2f s  total ${(now - t0) / 1e9}%6.2f s")
      graft.CacheRegistry.clear()
    }
    pass("cold")
    pass("warm")
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
