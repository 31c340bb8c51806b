package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The UNIFORM-corpus half of the ladder capture ([[LadderProbe]] covers
  * the blowup fixture, whose jitter-copy construction makes true
  * near-dup pairs grow ∝ factor² by design — there the candidate count
  * measures duplicate MASS, not the bucket law). Here the corpus is n
  * deterministic pseudo-random 128-dim vectors (hash-lattice, no copies,
  * no planted structure), so same-bucket pairs measure the LAW itself:
  * buckets ∝ n, pairs/n ≈ the occupancy target, at corpora PAST the old
  * 2¹² cap where pairs previously reverted to n²/4096. The `capAt12`
  * arm re-applies the old cap to the same corpus for the side-by-side.
  *
  * Usage: `sbt "runMain graft.tools.SynthLadderProbe <n> [<n> ...]"`
  */
object SynthLadderProbe {

  def main(args: Array[String]): Unit = {
    val ns = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(262144L, 1048576L)
    val spark = GraftSession.getOrCreate("synth-ladder-probe")
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.DotProductDouble.register(spark)

    for (n <- ns; (tag, cap) <- Seq("cap32" -> Dedup.LshMaxPlanes, "cap12" -> 12)) {
      val base = spark.range(n).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(128)), i =>
          ((pmod(hash(col("id") * 131 + i), lit(2001)) - lit(1000))
            .cast("double") / lit(1000.0))).as("v"))
        .withColumn("bucket_full", Similarity.bucketCol(cap))
      val np = broadcast(base.agg(
        greatest(lit(Dedup.LshFloorPlanes), least(lit(cap),
          ceil(log2(count(lit(1)).cast("double") /
            lit(Dedup.LshTargetBucket.toDouble))).cast("int"))).as("np")))
      val e = base.crossJoin(np)
        .withColumn("bucket", expr("bucket_full & (shiftleft(1L, np) - 1L)"))
      val t0 = System.nanoTime()
      val row = e.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"),
          count(lit(1)).as("buckets"),
          sum((col("cnt") * (col("cnt") - 1)).cast("decimal(38,0)")).as("pairs2"),
          max(col("cnt")).as("max_bucket")).collect()(0)
      val npv = e.select(col("np")).limit(1).collect()(0).getInt(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = row.getDecimal(2).toBigInteger
        .divide(java.math.BigInteger.valueOf(2))
      println(s"""{"probe":"synth_ladder","arm":"$tag","n":${row.getLong(0)},""" +
        s""""np":$npv,"buckets":${row.getLong(1)},"pairs":$pairs,""" +
        f""""max_bucket":${row.getLong(3)},"agg_sec":$secs%.2f}""")
    }
    spark.stop()
  }
}
