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
  *     → published parquet + a per-stage manifest
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

    published.write.mode("overwrite").parquet(s"$outDir/corpus")
    val manifest =
      s"""{"raw":$rawCt,"exact_dedup":$exactCt,"near_dedup":$nearCt,""" +
        s""""quality":$qualityCt,"sampled":$sampledCt}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/manifest.json"), manifest)
    println(s"[llm-pipeline] $manifest")
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
