package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequence packing — the step that turns a filtered corpus into
  * fixed-budget training sequences: documents are concatenated in stable
  * doc_id order and chunked into bins of [[Budget]] tokens (the
  * concat-then-chunk packing most LLM data pipelines use). Per document
  * the query reports its global token offset and the bin range it lands
  * in — everything a sharded sequence writer needs to emit its slice
  * independently.
  *
  * Scale design — the global offset is an ORDERED PREFIX SUM, and the
  * naive formulation (`sum over (ORDER BY doc_id)`) is a single-reducer
  * whole-corpus sort, the same trap the percentile rewrite removed. Two
  * passes instead:
  *   1. coarse buckets (doc_id div [[BucketWidth]], monotonic in doc_id)
  *      → per-bucket token sums → exclusive cumsum over the SMALL bucket
  *      table → per-bucket base offsets, broadcast back;
  *   2. within-bucket exclusive prefix via a window partitioned by bucket
  *      (≤ BucketWidth rows per partition) + the bucket base.
  * BucketWidth is the slice lever: pick ~sqrt(n) (or recurse) so neither
  * the bucket table nor a bucket partition outgrows a reducer. The oracle
  * is the single-window formulation, hash-proving the rewrite.
  */
object Packing {

  /** Tokens per packed training sequence. */
  private val Budget = 512

  /** Docs per prefix-sum bucket (the partition-size lever). */
  private val BucketWidth = 64

  /** The two-pass packed-offset computation over a `(doc_id, n_tokens, …)`
    * frame, prefix-summed independently per `part` grouping columns (empty
    * = one global stream; the pipeline passes `Seq("split")` to pack each
    * training split on its own). ONE implementation shared by the
    * oracle-checked `pack_sequences` and `tools.LlmPipeline`, so a
    * Budget/BucketWidth change can never fork the two.
    */
  private[graft] def withPackedOffsets(df: DataFrame, part: Seq[String]): DataFrame = {
    // the prefix-sum passes touch only (part, doc_id, n_tokens) — persist
    // that SLIM projection (feeds the bucket-sum pass and the within-bucket
    // window) and join the computed columns back by doc_id, so a caller
    // passing wide rows (the pipeline's full documents) never caches the
    // text column corpus-wide
    val slim = graft.CacheRegistry.persist(
      df.select((part :+ "doc_id" :+ "n_tokens").map(col): _*)
        .withColumn("bucket", expr(s"doc_id div $BucketWidth")))
    val baseW = Window.partitionBy(part.map(col): _*).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = slim.groupBy((part :+ "bucket").map(col): _*)
      .agg(sum("n_tokens").as("bsum"))
      .withColumn("base", coalesce(sum(col("bsum")).over(baseW), lit(0L)))
      .select((part :+ "bucket" :+ "base").map(col): _*)
    val w = Window.partitionBy((part :+ "bucket").map(col): _*).orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = slim.join(broadcast(bases), part :+ "bucket")
      .withColumn("tok_offset",
        col("base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_first", expr(s"tok_offset div $Budget"))
      .withColumn("bin_last", expr(s"(tok_offset + n_tokens - 1) div $Budget"))
      .select(col("doc_id"), col("tok_offset"), col("bin_first"), col("bin_last"))
    df.join(offsets, "doc_id")
  }

  val packSequences: GraftQuery = new GraftQuery {
    val name = "pack_sequences"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // EXACT BPE token counts (round 8): the packing budget is counted
      // in the tokens the trainer will actually see, not whitespace
      // words; tokenless docs have no docCounts row, matching the old
      // n_tokens > 0 filter
      val t = graft.functions.Bpe.docCountsShared(spark, sfDir)
        .select(col("doc_id"), col("bpe_ct").as("n_tokens"))
      withPackedOffsets(t, Seq.empty)
        .withColumn("bins_spanned", col("bin_last") - col("bin_first") + 1)
        .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
          col("bin_first"), col("bin_last"), col("bins_spanned"))
        .orderBy("doc_id")
    }

    def oracle: Option[String] = Some(
      graft.functions.Bpe.duckToksRecursiveCte +
        graft.functions.Bpe.duckBpeCtes + s"""
      , t AS (SELECT doc_id, bpe_ct AS n_tokens FROM bpe),
      o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        FROM t)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, tok_offset,
             tok_offset // $Budget AS bin_first,
             (tok_offset + n_tokens - 1) // $Budget AS bin_last,
             ((tok_offset + n_tokens - 1) // $Budget) - (tok_offset // $Budget) + 1 AS bins_spanned
      FROM o ORDER BY doc_id
    """)
  }

  /** Tokens per chunk / stride between chunk starts (overlap = 16). */
  private val ChunkSize = 64
  private val ChunkStride = 48

  /** Context-length chunking — packing's dual: instead of concatenating
    * short documents up to a budget, SPLIT each document into fixed-size
    * token windows with overlapping stride (the standard way long
    * documents become training sequences without losing cross-boundary
    * context). Map-only: `sequence(1, n, stride)` explodes the chunk
    * starts, the chunk's token slice is hashed so the oracle proves
    * CONTENT equality, not just boundaries. No shuffle before the output
    * sort; at 100 TB this runs as a projection over the corpus scan.
    */
  val chunkDocuments: GraftQuery = new GraftQuery {
    val name = "chunk_documents"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .withColumn("n", size(col("ws")).cast("long"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("ws"), col("n"),
          posexplode(sequence(lit(1L), col("n"), lit(ChunkStride.toLong)))
            .as(Seq("k", "start_pos")))
        .withColumn("chunk_id", col("k").cast("long"))
        .withColumn("chunk_tokens",
          least(lit(ChunkSize.toLong), col("n") - col("start_pos") + 1))
        .withColumn("chunk_md5",
          md5(concat_ws(" ", slice(col("ws"), col("start_pos").cast("int"),
            col("chunk_tokens").cast("int")))))
        .select("doc_id", "chunk_id", "start_pos", "chunk_tokens", "chunk_md5")
        .orderBy("doc_id", "chunk_id")

    def oracle: Option[String] = Some(duckToksCte + s"""
      , t AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
      c AS (
        SELECT doc_id, ws, n,
               unnest(generate_series(1, n, $ChunkStride)) AS start_pos
        FROM t),
      d AS (
        SELECT doc_id,
               (start_pos - 1) // $ChunkStride AS chunk_id,
               CAST(start_pos AS BIGINT) AS start_pos,
               least($ChunkSize, n - start_pos + 1) AS chunk_tokens,
               md5(array_to_string(ws[start_pos:start_pos + least($ChunkSize, n - start_pos + 1) - 1], ' ')) AS chunk_md5
        FROM c)
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, start_pos,
             CAST(chunk_tokens AS BIGINT) AS chunk_tokens, chunk_md5
      FROM d ORDER BY doc_id, chunk_id
    """)
  }

  /** CONTENT-DEFINED chunking (the FastCDC family, public algorithm):
    * chunk boundaries fall after tokens whose hash satisfies a fixed
    * condition (here hash16 % 16 == 0, ~16-token expected chunks)
    * instead of at fixed strides. The property that matters for dedup:
    * an insertion shifts every fixed-stride chunk after it (all hashes
    * change — [[chunkDocuments]] finds nothing), while content-defined
    * boundaries re-synchronize at the next boundary token, so every
    * chunk past it keeps an IDENTICAL hash and chunk-level dedup still
    * matches the unedited remainder (spec-proven on an edited twin).
    * Production CDC adds min/max chunk bounds, which make the boundary
    * decision sequential; the pure form keeps the decision per-token —
    * embarrassingly parallel and cross-engine reproducible — and the
    * bounds can ride the same segment arithmetic later.
    *
    * Map-only: boundary positions, chunk slices and hashes are all
    * per-row array work over one corpus scan; the only exchange is the
    * deterministic output sort.
    */
  /** [[chunkDocumentsCdc]]'s core over any (doc_id, text) frame — the
    * spec seam for the insertion-robustness property.
    */
  private[graft] def cdcChunksOf(docs: DataFrame): DataFrame =
    docs
        .select(col("doc_id"), tokens(col("text")).as("ws"))
        .withColumn("n", size(col("ws")))
        .filter(col("n") > 0)
        // boundary AFTER token i iff hash16(token_i) % 16 == 0; the last
        // token always closes the final chunk
        .withColumn("ends", array_union(
          filter(sequence(lit(1), col("n")),
            i => hash16(element_at(col("ws"), i)) % 16 === 0),
          array(col("n"))))
        .withColumn("pairs", zip_with(
          concat(array(lit(0)), slice(col("ends"), lit(1), size(col("ends")) - 1)),
          col("ends"),
          (prev, e) => struct((prev + 1).as("s"), e.as("e"))))
        .select(col("doc_id"), col("ws"),
          posexplode(col("pairs")).as(Seq("chunk_idx", "p")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("p.s").cast("long").as("tok_start"),
          (col("p.e") - col("p.s") + 1).cast("long").as("tok_ct"),
          md5(concat_ws(" ",
            slice(col("ws"), col("p.s"), col("p.e") - col("p.s") + 1)))
            .as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")

  val chunkDocumentsCdc: GraftQuery = new GraftQuery {
    val name = "chunk_documents_cdc"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      cdcChunksOf(Tables.load(spark, sfDir, "documents"))

    def oracle: Option[String] = Some(duckToksCte + s"""
      , t AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
      e AS (
        SELECT doc_id, ws,
               list_sort(list_distinct(list_concat(
                 list_filter(generate_series(1, n),
                   i -> ${duckHash16("ws[i]")} % 16 = 0), [n]))) AS ends
        FROM t),
      c AS (
        SELECT doc_id, ws, ends,
               unnest(generate_series(1, len(ends))) AS k
        FROM e)
      SELECT doc_id,
             CAST(k - 1 AS BIGINT) AS chunk_idx,
             CAST(CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END AS BIGINT) AS tok_start,
             CAST(ends[k] - (CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END) + 1 AS BIGINT) AS tok_ct,
             md5(array_to_string(ws[(CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END):ends[k]], ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_idx
    """)
  }

  val all: Seq[GraftQuery] = Seq(packSequences, chunkDocuments, chunkDocumentsCdc)
}
