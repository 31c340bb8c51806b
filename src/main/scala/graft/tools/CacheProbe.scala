package graft.tools

import graft.GraftSession

/** Prints the materialized partition layout of each session-shared cached
  * frame — the knob `canChangeCachedPlanOutputPartitioning=true` turns is
  * AQE coalescing INSIDE these caches, so this probe is how a layout
  * pathology (a hot cache collapsed to one partition, starving every
  * consumer of parallelism) gets caught instead of guessed at.
  *
  * Usage: `sbt "runMain graft.tools.CacheProbe [sfDir]"`
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.getOrCreate("cache-probe")
    spark.sparkContext.setLogLevel("WARN")
    // A/B lever: SPARK_GRAFT_CACHED_AQE=false restores the pre-round-7
    // cached-plan layout for comparison
    sys.env.get("SPARK_GRAFT_CACHED_AQE").foreach(v => spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v))
    graft.operators.Warmup.layout(spark, sfDir).foreach { case (n, rows, p) =>
      println(f"[cache-probe] $n%-14s rows=$rows%-8d parts=$p")
    }
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
