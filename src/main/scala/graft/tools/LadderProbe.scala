package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Scale probe for the adaptive-LSH ladders (round-11: both caps were
  * lifted past the design corpus — embeddingLsh 12→32 planes, media ANN
  * 12→24). The claim to convict or confirm: BUCKETS track the corpus
  * (≈ n / occupancy-target of them) and SAME-BUCKET CANDIDATE PAIRS stay
  * ~linear in n, at corpora PAST the old 2¹² cap where pairs previously
  * reverted to n²/4096.
  *
  * One JSON line per side:
  *   - `embedding`: n, the in-plan np, populated buckets, and
  *     Σ C(bucket,2) same-bucket pairs (the exact candidate count of
  *     [[Dedup.embeddingLsh]]'s self-join, measured without running the
  *     O(pairs) dot products).
  *   - `media`: same over the media-ANN bucketed frame, plus the scored
  *     candidate count of the real query shape (query side is the
  *     media_id % 20 sample, as in the oracled query).
  *
  * Usage: `sbt "runMain graft.tools.LadderProbe <sfDir>"`; BASELINE.md
  * records sf0.1 / 10x / 100x captures.
  */
object LadderProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // optional: the ScaleFixture blowup factor. The fixture's copies
    // jitter each dimension by ±0.003 — copies of one vector share sign
    // buckets almost surely, so a copy family of f vectors IS ~C(f,2)
    // TRUE near-dup pairs and total candidates necessarily grow ∝ f².
    // With the factor known (vec_id div factor = the copy family), the
    // probe splits candidates into the irreducible true-pair mass and
    // the cross-family noise the bucket law actually governs.
    val factor = if (args.length > 1) Some(args(1).toLong) else None
    val spark = GraftSession.getOrCreate("ladder-probe")
    spark.sparkContext.setLogLevel("WARN")

    // --- embedding side: the dedup_embedding_lsh bucket law -----------
    locally {
      val base = Similarity.vecs(spark, sfDir)
        .withColumn("bucket_full", Similarity.bucketCol(Dedup.LshMaxPlanes))
      val np = broadcast(base.agg(
        greatest(lit(Dedup.LshFloorPlanes), least(lit(Dedup.LshMaxPlanes),
          ceil(log2(count(lit(1)).cast("double") /
            lit(Dedup.LshTargetBucket.toDouble))).cast("int"))).as("np")))
      val e = base.crossJoin(np)
        .withColumn("bucket", expr("bucket_full & (shiftleft(1L, np) - 1L)"))
      val perBucket = e.groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val t0 = System.nanoTime()
      val row = perBucket.agg(
        sum(col("cnt")).as("n"),
        count(lit(1)).as("buckets"),
        // 2·pairs summed exactly in decimal; halved on the driver
        sum((col("cnt") * (col("cnt") - 1)).cast("decimal(38,0)")).as("pairs2"),
        max(col("cnt")).as("max_bucket")).collect()(0)
      val npv = e.select(col("np")).limit(1).collect()(0).getInt(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val pairs = row.getDecimal(2).toBigInteger
        .divide(java.math.BigInteger.valueOf(2))
      val familyPairs = factor.map { f =>
        e.groupBy(col("bucket"), (col("vec_id") / lit(f)).cast("long").as("fam"))
          .agg(count(lit(1)).as("cnt"))
          .agg(sum((col("cnt") * (col("cnt") - 1)).cast("decimal(38,0)")))
          .collect()(0).getDecimal(0).toBigInteger
          .divide(java.math.BigInteger.valueOf(2))
      }
      println(s"""{"probe":"ladder","side":"embedding","n":${row.getLong(0)},""" +
        s""""np":$npv,"buckets":${row.getLong(1)},""" +
        s""""pairs":$pairs,""" +
        familyPairs.map(fp => s""""same_family_pairs":$fp,""").getOrElse("") +
        f""""max_bucket":${row.getLong(3)},"agg_sec":$secs%.2f}""")
    }

    // --- media side: the media_ann bucket law + real candidate count --
    locally {
      val media = Multimodal.mediaTable(spark, sfDir)
        .withColumn("txt", col("payload").cast("string"))
        .filter(length(col("payload")) === char_length(col("txt")) &&
          length(col("payload")) > 0)
        .drop("txt")
      val t0 = System.nanoTime()
      val scored = Multimodal.mediaAnnScored(media,
        Multimodal.MediaPlanes24, Some(64L)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val n = media.count()
      println(s"""{"probe":"ladder","side":"media","n":$n,""" +
        f""""scored_candidates":$scored,"scored_sec":$secs%.2f}""")
    }
    spark.stop()
  }
}
