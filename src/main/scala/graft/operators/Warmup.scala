package graft.operators

import org.apache.spark.sql.SparkSession

/** Materializes the session-shared frames ([[graft.CacheRegistry.shared]])
  * outside any per-query timer. The frames shared across the suite —
  * the enriched-events derivation (seven log queries), the normalized
  * embedding vectors (the ANN family), the char-5-gram sketches (ngram
  * dedup + contamination), the tokenized corpus (the span family +
  * pipeline manifest), the derived document embeddings (doc_embed /
  * doc_embed_ann / dedup_semantic_text), the blocked k-NN neighbor
  * rows (the KnnJoin trio), the exact BPE token counts
  * (text_stats / pack_sequences / sample_mixture), the span-pair frame
  * (dedup_span / span_coverage), and the PQ cell ranking + 8/16-subspace
  * sub-vector tables (the ann_ivf_pq* family). Without an explicit
  * warmup, whichever query a harness happens to run first against each
  * frame is charged its full build cost, making per-query timings
  * order-dependent. (The pipeline-manifest loser frames stay OUT by
  * design: they are the staged outputs of the dedup apps, and charging
  * the composition's run 1 their cold build is the documented cost model
  * — see `PipelineManifest`.)
  */
object Warmup {

  /** Build and persist every shared frame for `sfDir`; returns seconds
    * spent so harnesses can report the cost as its own line item.
    */
  def sharedFrames(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    LogStats.enriched(spark, sfDir).count()
    Similarity.vecs(spark, sfDir).count()
    Dedup.ngramSketches(spark, sfDir).count()
    SpanDedup.sharedToks(spark, sfDir).count()
    TextEmbed.docVectors(spark, sfDir).count()
    KnnJoin.knnRows(spark, sfDir).count()
    graft.functions.Bpe.docCountsShared(spark, sfDir).count()
    SpanDedup.sharedSpanPairs(spark, sfDir).count()
    ProductQuant.sharedRanked(spark, sfDir).count()
    ProductQuant.sharedSub(spark, sfDir, 8).count()
    ProductQuant.sharedSub(spark, sfDir, 16).count()
    Similarity.mixedVecs(spark, sfDir).count()
    ProductQuant.sharedRanked(spark, sfDir, ProductQuant.SrcClu).count()
    ProductQuant.sharedSub(spark, sfDir, 8, ProductQuant.SrcClu).count()
    ProductQuant.sharedSub(spark, sfDir, 16, ProductQuant.SrcClu).count()
    Opq.opqEmb(spark, sfDir).count()
    Opq.opqClu(spark, sfDir).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** (name, build seconds, rows) per shared frame — the per-frame
    * attribution of [[sharedFrames]]' aggregate (`tools.SharedProbe`),
    * for reading scale captures where an operator's real cost lives in
    * its shared frame.
    */
  def timedFrames(spark: SparkSession, sfDir: String): Seq[(String, Double, Long)] = {
    def time(name: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      (name, (System.nanoTime() - t0) / 1e9, n)
    }
    Seq(
      time("enriched")(LogStats.enriched(spark, sfDir).count()),
      time("vecs")(Similarity.vecs(spark, sfDir).count()),
      time("ngram_sk")(Dedup.ngramSketches(spark, sfDir).count()),
      time("doc_toks")(SpanDedup.sharedToks(spark, sfDir).count()),
      time("doc_embed")(TextEmbed.docVectors(spark, sfDir).count()),
      time("knn")(KnnJoin.knnRows(spark, sfDir).count()),
      time("bpe_counts")(graft.functions.Bpe.docCountsShared(spark, sfDir).count()),
      time("span_pairs")(SpanDedup.sharedSpanPairs(spark, sfDir).count()),
      time("pq_ranked")(ProductQuant.sharedRanked(spark, sfDir).count()),
      time("pq_sub8")(ProductQuant.sharedSub(spark, sfDir, 8).count()),
      time("pq_sub16")(ProductQuant.sharedSub(spark, sfDir, 16).count()),
      time("clu_vecs")(Similarity.mixedVecs(spark, sfDir).count()),
      time("pq_ranked_clu")(
        ProductQuant.sharedRanked(spark, sfDir, ProductQuant.SrcClu).count()),
      time("pq_sub8_clu")(
        ProductQuant.sharedSub(spark, sfDir, 8, ProductQuant.SrcClu).count()),
      time("pq_sub16_clu")(
        ProductQuant.sharedSub(spark, sfDir, 16, ProductQuant.SrcClu).count()),
      time("opq_vecs_emb")(Opq.opqEmb(spark, sfDir).count()),
      time("opq_vecs_clu")(Opq.opqClu(spark, sfDir).count()))
  }

  /** (name, rows, materialized partitions) for every shared frame —
    * `tools.CacheProbe`'s data source; the partition column is what
    * cached-plan AQE coalescing changes.
    */
  def layout(spark: SparkSession, sfDir: String): Seq[(String, Long, Int)] =
    Seq(
      ("enriched", LogStats.enriched(spark, sfDir)),
      ("vecs", Similarity.vecs(spark, sfDir)),
      ("ngram_sk", Dedup.ngramSketches(spark, sfDir)),
      ("doc_toks", SpanDedup.sharedToks(spark, sfDir)),
      ("doc_embed", TextEmbed.docVectors(spark, sfDir)),
      ("knn", KnnJoin.knnRows(spark, sfDir)),
      ("bpe_counts", graft.functions.Bpe.docCountsShared(spark, sfDir)),
      ("span_pairs", SpanDedup.sharedSpanPairs(spark, sfDir)),
      ("pq_ranked", ProductQuant.sharedRanked(spark, sfDir)),
      ("pq_sub8", ProductQuant.sharedSub(spark, sfDir, 8)),
      ("pq_sub16", ProductQuant.sharedSub(spark, sfDir, 16)),
      ("clu_vecs", Similarity.mixedVecs(spark, sfDir)),
      ("opq_vecs_emb", Opq.opqEmb(spark, sfDir)),
      ("opq_vecs_clu", Opq.opqClu(spark, sfDir))
    ).map { case (n, df) => (n, df.count(), df.rdd.getNumPartitions) }
}
