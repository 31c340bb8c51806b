package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Sampling}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus pipeline composed from the library's
  * operators — the LLM-suite counterpart of `streaming/Demo`:
  *
  *   raw documents
  *     → exact dedup (md5 groupBy, min-id keeper)
  *     → near-dup removal (minhash cluster non-keepers dropped)
  *     → quality filter (length + alphanumeric-ratio bounds)
  *     → deterministic stratified sampling (per-source rates)
  *     → PII redaction (emails/phones → typed placeholders)
  *     → deterministic train/val/test split (salted md5 boundaries)
  *     → sequence packing (global token offsets, 512-token bins)
  *     → published parquet (per split, with offsets) + a per-stage manifest
  *
  * Every stage is the SAME code the oracle-checked queries run, so the
  * pipeline inherits their determinism: re-running produces the identical
  * corpus byte for byte.
  *
  * Usage: `sbt "runMain graft.tools.LlmPipeline <sfDir> <outDir>"`
  */
object LlmPipeline {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.getOrCreate("llm-pipeline")
    import spark.implicits._

    val raw = Tables.load(spark, sfDir, "documents")
    val rawCt = raw.count()

    // 1. exact dedup: keep the min doc_id per content hash
    val keepers = raw.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exactDeduped = raw.join(keepers, "doc_id")
    val exactCt = exactDeduped.count()

    // 2. near-dup removal: drop minhash-cluster members that are not the
    //    cluster keeper (min id)
    val dupLosers = Dedup.clusters.run(spark, sfDir)
      .filter(col("is_keeper") === 0).select("doc_id")
    val nearDeduped = exactDeduped.join(dupLosers, Seq("doc_id"), "left_anti")
    val nearCt = nearDeduped.count()

    // 3. quality filter: length and alphanumeric-ratio bounds
    val quality = nearDeduped
      .withColumn("alnum_ct",
        length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")))
      .filter(col("n_chars") >= 50 && col("n_chars") <= 100000 &&
        col("alnum_ct") * 10 >= col("n_chars") * 5) // ≥50% alnum
      .drop("alnum_ct")
    val qualityCt = quality.count()

    // 4. deterministic stratified sample (the sample_stratified decision)
    val rates = Seq.tabulate(20)(i => (s"src$i", if (i % 2 == 0) 2500 else 7500))
      .toDF("source", "rate_bp")
    val sampled = quality
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 10000)
      .join(broadcast(rates), "source")
      .filter(col("h") < col("rate_bp"))
      .drop("h", "rate_bp")
    val sampledCt = sampled.count()

    // 5. PII redaction
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\+[0-9]{7,}"
    val published = sampled.withColumn("text",
      regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
        phonePat, "<PHONE>"))

    // 6. train/val/test split (the split_assign decision, salted so it is
    //    independent of the sampling hash)
    val splits = Seq(("train", 0, 9000), ("val", 9000, 9500), ("test", 9500, 10000))
      .toDF("split", "lo_bp", "hi_bp")
    val assigned = published
      .withColumn("sh",
        conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 6), 16, 10)
          .cast("long") % 10000)
      .join(broadcast(splits), col("sh") >= col("lo_bp") && col("sh") < col("hi_bp"))
      .drop("sh", "lo_bp", "hi_bp")

    // 7. sequence packing per split: two-pass distributed prefix sum over
    //    (split, bucket) — the Packing.packSequences shape, partitioned a
    //    level deeper so each split packs independently
    import org.apache.spark.sql.expressions.Window
    val toks = assigned.withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket", expr("doc_id div 64"))
    val bases = toks.groupBy("split", "bucket").agg(sum("n_tokens").as("bsum"))
      .withColumn("base", coalesce(
        sum(col("bsum")).over(Window.partitionBy("split").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("split"), col("bucket"), col("base"))
    val wIn = Window.partitionBy("split", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = toks.join(broadcast(bases), Seq("split", "bucket"))
      .withColumn("tok_offset", col("base") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .withColumn("bin_first", expr("tok_offset div 512"))
      .drop("bucket", "base")

    packed.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")
    val splitCts = packed.groupBy("split").agg(
        count(lit(1)).as("ct"), sum("n_tokens").as("tok"))
      .collect().map(r => s""""${r.getString(0)}":{"docs":${r.getLong(1)},"tokens":${r.getLong(2)}}""")
      .sorted.mkString(",")
    val manifest =
      s"""{"raw":$rawCt,"exact_dedup":$exactCt,"near_dedup":$nearCt,""" +
        s""""quality":$qualityCt,"sampled":$sampledCt,"splits":{$splitCts}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/manifest.json"), manifest)
    println(s"[llm-pipeline] $manifest")
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
