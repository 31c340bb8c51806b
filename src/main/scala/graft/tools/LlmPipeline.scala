package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Packing, Sampling}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus pipeline composed from the library's
  * operators — the LLM-suite counterpart of `streaming/Demo`:
  *
  *   raw documents
  *     → exact dedup (md5 groupBy, min-id keeper)
  *     → near-dup removal (minhash cluster non-keepers dropped) +
  *       semantic prune (SemDeDup dominated embeddings) + span
  *       decontamination (≥ 50% shared-text coverage dropped) [staged]
  *     → quality filter (Gopher rule battery hard gate, then the
  *       corpus-LM score over the corpus's own distribution) [staged]
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
    //    cluster keeper (min id). STAGE BOUNDARY after it: the dedup
    //    stage's heavyweight caches (shingle arrays, per-round label
    //    frames) are registered with CacheRegistry and would otherwise
    //    stay pinned through packing and the final write — write the
    //    deduped corpus to a staging dir (the between-apps topic analog),
    //    release the caches, continue from the staged read.
    val dupLosers = Dedup.clusters.run(spark, sfDir)
      .filter(col("is_keeper") === 0).select("doc_id")
    // 2b. SEMANTIC prune (SemDeDup): drop documents whose embedding is
    //     dominated by a lower-id cluster-mate — the SAME semanticDominated
    //     the oracle-checked dedup_semantic query runs. The fixture's
    //     embeddings table covers a prefix of the corpus with vec_id =
    //     doc_id; docs without an embedding pass through untouched.
    val semLosers = Dedup.semanticDominated(spark, sfDir)
      .select(col("vec_id").as("doc_id"))
    // 2c. span decontamination: drop documents ≥ 50% covered by text
    //     shared with other documents — the SAME spanCoverage verdict the
    //     oracle-checked span_coverage query computes
    val spanLosers = graft.operators.SpanDedup.spanCoverage.run(spark, sfDir)
      .filter(col("drop_flag") === 1).select("doc_id")
    exactDeduped
      .join(dupLosers, Seq("doc_id"), "left_anti")
      .join(semLosers, Seq("doc_id"), "left_anti")
      .join(spanLosers, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/stage_dedup")
    graft.CacheRegistry.clear()
    val nearDeduped = spark.read.parquet(s"$outDir/stage_dedup")
    val nearCt = nearDeduped.count()

    // 3. quality filter: the Gopher hard-gate rule battery (the SAME
    //    ruleFrame the oracle-checked doc_quality_rules query runs — word
    //    count, mean word length, alphabetic/stopword/repetition rules),
    //    then the corpus-LM score (the doc_lm_score op over THIS corpus's
    //    own distribution) drops rare-token-gibberish outliers
    val ruleKeep = graft.operators.Relevance.ruleFrame(nearDeduped)
      .filter(col("keep") === 1).select("doc_id")
    val shaped = nearDeduped.join(ruleKeep, "doc_id")
    // the classifier-style scorer (doc_quality_score's expression) rides
    // the same scan as the shape filter — map-side, no extra pass; the
    // loose threshold mirrors a trained-classifier keep decision
    graft.expressions.DocQuality.register(spark)
    val classed = shaped.filter(
      coalesce(expr("doc_quality(text)"), lit(Long.MinValue)) >= -100000L)
    val lmKeep = graft.operators.Relevance.lmScores(classed)
      .filter(col("avg_lp_x1m") >= -3600000L) // avg token logprob ≥ -3.6
      .select("doc_id")
    // STAGE BOUNDARY: lmScores persists the full token-explode (the
    // job's largest intermediate) and four downstream actions would
    // otherwise re-run its shuffles from lineage — stage the filtered
    // corpus and release the scoring caches before sampling/packing
    shaped.join(lmKeep, "doc_id")
      .write.mode("overwrite").parquet(s"$outDir/stage_quality")
    graft.CacheRegistry.clear()
    val quality = spark.read.parquet(s"$outDir/stage_quality")
    val qualityCt = quality.count()

    // 4. deterministic stratified sample — the SAME sampleHash the
    //    oracle-checked sample_stratified query runs
    val rates = Sampling.rateRows.toDF("source", "rate_bp")
    val sampled = quality
      .withColumn("h", Sampling.sampleHash(col("doc_id")))
      .join(broadcast(rates), "source")
      .filter(col("h") < col("rate_bp"))
      .drop("h", "rate_bp")
    val sampledCt = sampled.count()

    // 4b. data mixture: re-weight the surviving source composition toward
    //     the target weights under the token budget — the SAME rates and
    //     salted hash the oracle-checked sample_mixture query runs
    val mixed = Sampling.applyMixture(sampled.withColumn("tok_ct",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")))
      .drop("tok_ct")
    val mixedCt = mixed.count()

    // 5. PII redaction
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\+[0-9]{7,}"
    val published = mixed.withColumn("text",
      regexp_replace(regexp_replace(col("text"), emailPat, "<EMAIL>"),
        phonePat, "<PHONE>"))

    // 6. train/val/test split — the SAME withSplit the oracle-checked
    //    split_assign query runs (salted hash, broadcast boundaries)
    val assigned = Sampling.withSplit(published)

    // 7. sequence packing per split — the SAME two-pass prefix sum the
    //    oracle-checked pack_sequences runs, partitioned one level deeper
    //    so each training split packs independently
    val toks = assigned.withColumn("n_tokens",
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") > 0)
    val packed = Packing.withPackedOffsets(toks, Seq("split"))

    packed.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")
    val splitCts = packed.groupBy("split").agg(
        count(lit(1)).as("ct"), sum("n_tokens").as("tok"))
      .collect().map(r => s""""${r.getString(0)}":{"docs":${r.getLong(1)},"tokens":${r.getLong(2)}}""")
      .sorted.mkString(",")
    val manifest =
      s"""{"raw":$rawCt,"exact_dedup":$exactCt,"near_dedup":$nearCt,""" +
        s""""quality":$qualityCt,"sampled":$sampledCt,"mixed":$mixedCt,"splits":{$splitCts}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/manifest.json"), manifest)
    println(s"[llm-pipeline] $manifest")
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
