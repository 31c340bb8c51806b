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

    // The survivor chain IS graft.operators.PipelineManifest.survivors —
    // the same composition the oracled `pipeline_manifest` query pins
    // against DuckDB, so the binary and the correctness gate cannot
    // drift. This hook adds what a production run wants on top: manifest
    // counts per stage, and STAGE BOUNDARIES after the two heavyweight
    // stages (dedup: shingle arrays + per-round label frames; quality:
    // the lmScores token explode) — write the surviving corpus to a
    // staging dir (the between-apps topic analog), release the
    // registered caches, continue from the staged read.
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def staged(name: String, key: String, df: org.apache.spark.sql.DataFrame) = {
      df.write.mode("overwrite").parquet(s"$outDir/stage_$name")
      graft.CacheRegistry.clear()
      val back = spark.read.parquet(s"$outDir/stage_$name")
      counts(key) = back.count()
      back
    }
    // Optional key-skew pre-stage (SPARK_GRAFT_SKEW_REPORT=1): before any
    // per-key stage runs, report content-hash row ownership of the raw
    // corpus — a single document duplicated at scale is THE whale key of
    // a dedup pipeline (its shingle bands all collide), and it surfaces
    // here as a flagged md5 share instead of a straggler task three
    // stages later. A report, not a filter: the decision to drop or salt
    // a hot key belongs to the operator configs. (A low-cardinality key
    // like `source` is the wrong gate — every source legitimately owns a
    // large share.)
    val skewGate = sys.env.get("SPARK_GRAFT_SKEW_REPORT").contains("1")
    val hook: (String, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame = {
      case ("raw", df) =>
        if (skewGate) {
          val rep = graft.operators.SkewReport.keySkewReport(df, md5(col("text")))
          rep.write.mode("overwrite").parquet(s"$outDir/key_skew")
          val flagged = spark.read.parquet(s"$outDir/key_skew")
            .filter(col("flagged") === 1L).count()
          counts("skew_flagged") = flagged
        }
        counts("raw") = df.count(); df
      case ("exact", df) => counts("exact_dedup") = df.count(); df
      case ("dedup", df) => staged("dedup", "near_dedup", df)
      case ("quality", df) => staged("quality", "quality", df)
      case ("sampled", df) => counts("sampled") = df.count(); df
      case ("mixed", df) => counts("mixed") = df.count(); df
      case (_, df) => df
    }
    val assigned = graft.operators.PipelineManifest.survivors(spark, sfDir, hook)

    // sequence packing per split — the SAME two-pass prefix sum the
    // oracle-checked pack_sequences runs, partitioned one level deeper
    // so each training split packs independently
    val packed = Packing.withPackedOffsets(assigned, Seq("split"))

    packed.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/corpus")
    // everything downstream reads the PUBLISHED corpus back (the staged()
    // discipline): the packed lineage spans sampling, mixture, redaction,
    // split and the two packing windows — recomputing it per consumer
    // would triple the tail of the pipeline
    val shipped = spark.read.parquet(s"$outDir/corpus")
    // corpus report: the per-(split, lang) tokenizer telemetry a training
    // run reads off every shipped corpus — word tokens (the manifest's
    // n_tokens definition), EXACT BPE subwords over the final redacted
    // text, and fertility (the bpe_fertility metric over the SHIPPED
    // corpus instead of the raw one). Read-only: the oracled survivor
    // chain is untouched.
    shipped
      .join(graft.functions.Bpe.docCounts(shipped), Seq("doc_id"), "left")
      .withColumn("sub_ct", coalesce(col("bpe_ct"), lit(0L)))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_tokens")).as("words"),
        sum(col("sub_ct")).as("bpe_tokens"))
      .withColumn("fertility_x100",
        when(col("words") > 0, expr("(bpe_tokens * 100) div words")))
      .orderBy("split", "lang")
      .write.mode("overwrite").parquet(s"$outDir/corpus_report")
    val splitCts = shipped.groupBy("split").agg(
        count(lit(1)).as("ct"), sum("n_tokens").as("tok"))
      .collect().map(r => s""""${r.getString(0)}":{"docs":${r.getLong(1)},"tokens":${r.getLong(2)}}""")
      .sorted.mkString(",")
    val skewPrefix =
      counts.get("skew_flagged").map(n => s""""skew_flagged":$n,""").getOrElse("")
    val manifest =
      s"""{$skewPrefix"raw":${counts("raw")},"exact_dedup":${counts("exact_dedup")},""" +
        s""""near_dedup":${counts("near_dedup")},"quality":${counts("quality")},""" +
        s""""sampled":${counts("sampled")},"mixed":${counts("mixed")},"splits":{$splitCts}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/manifest.json"), manifest)
    println(s"[llm-pipeline] $manifest")
    graft.CacheRegistry.clearAll()
    spark.stop()
  }
}
