package graft.streaming

import graft.operators.{InvertedIndex, LsmIndex, Retrieval}
import graft.sources.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Ranked search AS IT DEPLOYS: the corpus arrives as micro-batches, the
  * ingest path maintains (a) the LSM-segment inverted index
  * ([[graft.operators.LsmIndex]] — bytes written ∝ batch) plus (b) the
  * BM25 corpus statistics as three additively-maintained
  * [[SnapshotTable]]s, and QUERY TIME never rescans the corpus:
  *
  *  - `df` (token → document frequency): per-batch postings-row counts
  *    fold additively (a document arrives in exactly one batch, so batch
  *    dfs sum to corpus df with no retraction) — the [[DivergenceStream]]
  *    count-table shape on the token key;
  *  - `dl` (doc_id → document length): pure inserts under the same fold
  *    (disjoint docs), tile-clustered on doc_id so serving can prune to
  *    the candidate docs' tiles;
  *  - `agg` (metric → value): the 2-row corpus counter table (`n_docs`,
  *    `total_dl`) riding the SAME one-key additive fold — serving derives
  *    avgdl from one broadcast-sized read instead of re-aggregating the
  *    corpus-sized dl table.
  *
  * [[serve]] is the query-time path: query terms come off the maintained
  * df table (one TakeOrdered over the vocab relation — query FORMULATION;
  * a real engine takes literal user terms and skips even that), per-term
  * postings come off [[LsmIndex.termLookup]]'s pruned segment reads (≤1
  * file per live segment), candidate doc lengths come off the dl table
  * through [[SnapshotTable.readMatchingTiles]] (candidate tiles only —
  * the dl side of the scoring join is candidate-proportional, never
  * corpus-proportional), and the math is [[Retrieval.bm25Scores]] /
  * [[Retrieval.topDocs]] VERBATIM — so the maintained ranking is
  * oracle-checked against the relational corpus-scan truth
  * (`search_bm25`'s DuckDB SQL, reused verbatim by
  * `search_bm25_maintained`).
  *
  * Exactly-once: all three stat tables version by batch id through
  * [[AdditiveFold]] (replayed batches short-circuit at the merge CAS);
  * the index applies its own idempotent segment discipline. The
  * fresh-checkpoint guard checks EVERY maintained root (the
  * [[CollocStream]] half-wipe lesson: a wiped index with surviving stat
  * tables — or any other partial wipe — must fail loudly, not
  * double-count).
  *
  * Reference semantic anchor: keyword ranking
  * `RT/app/dws/KeywordStatsApp.java` ranks split words by windowed
  * counts; this operator is the full-relevance upgrade of that stage
  * (tf·idf with length normalization), maintained incrementally.
  */
object SearchStream {

  private[graft] def indexRoot(root: String) = s"$root/index"
  private[graft] def dfRoot(root: String) = s"$root/df"
  private[graft] def dlRoot(root: String) = s"$root/dl"
  private[graft] def aggRoot(root: String) = s"$root/agg"

  def start(docs: DataFrame, root: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, root)
      }
      .start()

  /** One micro-batch of (doc_id, text) rows: a fresh index segment plus
    * the three additive stat folds. Idempotent per batchId.
    * `maxSegments` is the LSM compaction cap (the lookup-fan-out knob).
    */
  def applyBatch(batch: DataFrame, batchId: Long, root: String,
      maxSegments: Int = LsmIndex.MaxSegments): Unit = {
    if (batch.isEmpty) return
    // Cross-root consistency guard — ALL FOUR maintained roots must agree
    // this checkpoint is genuine (the CollocStream half-wipe lesson, with
    // four tables). Within a batch the index writes FIRST, then df, dl,
    // agg; empty batches skip every root alike. So the legal states are:
    //  - everything fresh (new deployment), or
    //  - every present head/segment ≤ batchId with the index ≥ the stat
    //    heads (complete batches, or a crash window of the CURRENT batch
    //    being replayed).
    // Violations = a wiped subset: stats ahead of the index (wiped
    // index), a fresh stat table beside survivors not at exactly this
    // batch (wiped stats), or batchId behind any survivor (fresh
    // checkpoint against existing state).
    val statHeads = Seq(dfRoot(root), dlRoot(root), aggRoot(root))
      .map(r => SnapshotTable.latestVersion(r).map(_.drop(1).toLong))
    val idxMax = LsmIndex.liveSegments(indexRoot(root))
      .flatMap(s => "seg_(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))
      .maxOption
    val present = statHeads.flatten ++ idxMax
    if (statHeads.exists(_.isEmpty) && present.nonEmpty)
      require(present.forall(_ == batchId),
        s"SearchStream batch $batchId: some stat tables under $root are " +
          s"fresh while sibling state exists at ${present.max} — a wiped " +
          "subset (fresh checkpoint against partial state); wipe the " +
          "whole search root and the checkpoint together.")
    statHeads.flatten.maxOption.foreach { ms =>
      require(idxMax.exists(_ >= ms),
        s"SearchStream batch $batchId: stat tables under $root are at " +
          s"v$ms but the index has no segment that far — the index was " +
          "wiped out from under its stat tables (fresh checkpoint " +
          "against partial state); wipe the whole search root together.")
    }
    present.maxOption.foreach { mx =>
      require(batchId >= mx,
        s"SearchStream batch $batchId is behind $root's published state " +
          s"at $mx: fresh checkpoint against an existing search root — " +
          "wipe the search root and the checkpoint together, or resume " +
          "the original.")
    }
    LsmIndex.applyDocBatch(batch, batchId, indexRoot(root), maxSegments)
    // one tokenize pass for all three folds: postings persist for the
    // duration (the AdditiveFold discipline, one level up)
    val post = InvertedIndex.postings(batch).persist()
    try {
      val dfDeltas = post.groupBy(col("token")).agg(count(lit(1)).as("df"))
      AdditiveFold.foldInto(dfDeltas, dfRoot(root), "token", "df", "df",
        batchId, clusterFiles = 8)
      val dlDeltas = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      AdditiveFold.foldInto(dlDeltas, dlRoot(root), "doc_id", "dl", "dl",
        batchId, clusterFiles = 8)
      val aggDeltas = dlDeltas.agg(
        count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
        .select(explode(map(
          lit("n_docs"), col("n_docs"),
          lit("total_dl"), col("total_dl"))).as(Seq("metric", "value")))
      AdditiveFold.foldInto(aggDeltas, aggRoot(root), "metric", "value",
        "value", batchId, clusterFiles = 1)
    } finally { post.unpersist(blocking = false); () }
  }

  /** The maintained BM25 ranking — the query-time path. Returns None
    * before the first batch lands.
    */
  def serve(spark: SparkSession, root: String): Option[DataFrame] = for {
    dfTable <- SnapshotTable.read(spark, dfRoot(root))
    dlHead <- SnapshotTable.latestVersion(dlRoot(root))
    aggTable <- SnapshotTable.read(spark, aggRoot(root))
  } yield {
    val qterms = Retrieval.queryTerms(dfTable.select(col("token"), col("df")))
    // avgdl via the SAME double-op sequence the corpus derivation uses
    // (long * 1.0 / long), so maintained scores are bit-equal
    val stats = aggTable.groupBy()
      .agg(max(when(col("metric") === "n_docs", col("value"))).as("n_docs"),
        max(when(col("metric") === "total_dl", col("value"))).as("total_dl"))
      .select(col("n_docs"),
        (col("total_dl") * lit(1.0) / col("n_docs")).as("avgdl"))
    val postings = qterms.select(col("token")).collect()
      .map(r => LsmIndex.termLookup(spark, indexRoot(root), r.getString(0)))
      .reduceOption(_ unionByName _)
      .getOrElse(dfTable.limit(0)
        .select(lit("").as("token"), lit(0L).as("doc_id"), lit(0L).as("tf")))
      .select(col("token"), col("doc_id"), col("tf"))
    val cand = graft.CacheRegistry.persist(postings)
    // candidate doc lengths: candidate TILES of the dl table, never the
    // corpus — the join stays candidate-proportional at any corpus size
    val dl = SnapshotTable.readMatchingTiles(spark, dlRoot(root), dlHead,
        "doc_id", cand.select(col("doc_id")))
      .select(col("doc_id"), col("dl"))
    Retrieval.topDocs(Retrieval.bm25Scores(cand, qterms, dl, stats))
  }
}
