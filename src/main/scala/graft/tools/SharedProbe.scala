package graft.tools

import graft.GraftSession
import graft.operators._

/** Times each session-shared frame's build individually (the aggregate is
  * Bench's `shared_build` line) — the attribution needed to read a scale
  * capture where an operator's real cost lives in a shared frame (e.g.
  * `ann_knn_join` over the blocked k-NN rows).
  *
  * Usage: `sbt "runMain graft.tools.SharedProbe <sfDir>"`
  */
object SharedProbe {

  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = GraftSession.getOrCreate("shared-probe")
    spark.sparkContext.setLogLevel("WARN")
    val rows = Warmup.timedFrames(spark, sfDir)
    val body = rows.map { case (n, s, c) => s""""$n":{"sec":$s,"rows":$c}""" }
      .mkString(",")
    println(s"""{"sf":"$sfDir",$body}""")
    spark.stop()
  }
}
