package graft.streaming

import graft.operators.SpanDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the benchmark span-decontamination check
  * ([[graft.operators.SpanDedup.contaminationSpan]]): a live crawl feed
  * screened micro-batch by micro-batch for verbatim ≥ minSpan-token runs
  * shared with a STATIC evaluation set. Each micro-batch runs exactly
  * `SpanDedup.contaminationSpansAgainst` — the batch query's own core —
  * with the bench gram table built once and broadcast into every batch's
  * plan, so the streaming and batch paths cannot drift (the DedupStream
  * argument, for the span family).
  *
  * Why this streams exactly: a corpus document's spans are a function of
  * that document and the bench set alone — no cross-document state — so
  * micro-batched union ≡ one-shot over the full corpus (SpanStreamSpec
  * proves the equality on a planted-overlap feed).
  *
  * Delivery: foreachBatch is at-least-once; a replayed batch re-appends
  * IDENTICAL span rows (the computation is deterministic per doc), so
  * readers treat the output as a set — or swap the raw append for a
  * [[graft.sources.SnapshotTable]] publish keyed by batch id for
  * exactly-once, as documented on DedupStream.
  */
object SpanStream {

  /** Start the decontamination stream: `docs` is a streaming (doc_id,
    * text) frame; `benchDocs` the static eval set. Span rows
    * (doc_id, bench_id, pos, pos_b, span_tokens) append to `outDir`.
    */
  def start(docs: DataFrame, benchDocs: DataFrame, outDir: String,
      checkpointDir: String, n: Int = 5, minSpan: Int = 12,
      exactlyOnce: Boolean = false): StreamingQuery = {
    // built once, session-cached: the bench side is small by contract
    // (an eval set), exactly the frame the batch query broadcasts
    val benchG = SpanDedup.gramTableOf(benchDocs, n).persist()
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spans = SpanDedup.contaminationSpansAgainst(
            SpanDedup.gramTableOf(batch, n), benchG, n, minSpan)
          // span rows are a pure function of (batch, bench), so the
          // batch-id-keyed overwrite commit upgrades delivery from
          // at-least-once to exactly-once
          if (exactlyOnce) ExactlyOnce.write(spans, outDir, batchId)
          else spans.write.mode("append").parquet(outDir)
        }
        ()
      }
      .start()
  }
}
