package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale probe for the adaptive oversized-block guard: over an sfDir
  * (normally a [[ScaleFixture]] blowup) it measures, for the semantic-
  * dedup cell partition and for a planted single-label dominant block,
  * the block-size distribution and what [[Dedup.subdivide]] does to it —
  * depth (`np`), sub-bucket count, and max sub-block size. One JSON line
  * per scenario; BASELINE.md records the 10x capture.
  *
  * Usage: `sbt "runMain graft.tools.GuardProbe <sfDir> [maxBlock]"`
  */
object GuardProbe {

  private def probe(tag: String, labeled: DataFrame, maxBlock: Long): Unit = {
    val sub = Dedup.subdivide(labeled, maxBlock, Dedup.MaxPlanes)
      .groupBy("label", "np", "sub").agg(count(lit(1)).as("n"))
      .persist()
    val blocks = sub.groupBy("label", "np").agg(sum("n").as("bs"),
        count(lit(1)).as("buckets"), max("n").as("max_sub"))
      .persist()
    val total = blocks.agg(sum("bs")).collect()(0).getLong(0)
    val nBlocks = blocks.count()
    val maxBs = blocks.agg(max("bs")).collect()(0).getLong(0)
    val over = blocks.filter(col("np") > 0)
    val nOver = over.count()
    val (maxNp, maxSub) =
      if (nOver == 0) (0, 0L)
      else {
        val r = over.agg(max("np"), max("max_sub")).collect()(0)
        (r.getInt(0), r.getLong(1))
      }
    println(s"""{"probe":"$tag","rows":$total,"blocks":$nBlocks,"max_block":$maxBs,""" +
      s""""over_bound":$nOver,"max_np":$maxNp,"max_sub_block":$maxSub,"bound":$maxBlock}""")
    sub.unpersist(); blocks.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxBlock = if (args.length > 1) args(1).toLong else 4096L
    val spark = GraftSession.getOrCreate("guard-probe")
    spark.sparkContext.setLogLevel("WARN")

    // scenario 1: the dedup_semantic cell partition (k = ceil(sqrt(n)))
    val e = Similarity.vecs(spark, sfDir)
    val cents = e.join(broadcast(Dedup.sqrtCount(e)))
      .filter(col("vec_id") < col("k"))
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val cells = Similarity.cellRanked(e, cents)
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("cid").as("label"), col("v"), col("nrm"))
    probe("semantic_cells", cells, maxBlock)

    // scenario 2: the worst case the guard exists for — the ENTIRE corpus
    // as one dominant label (what a degenerate clustering would produce)
    probe("single_label", e.select(col("vec_id"), lit(0L).as("label"),
      col("v"), col("nrm")), maxBlock)

    graft.CacheRegistry.clear()
    spark.stop()
  }
}
