package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dedup against a PERSISTED corpus index — the re-crawl
  * reality a one-shot dedup ([[Dedup.minhashLsh]]) doesn't model: a new
  * batch must be deduplicated against everything already ingested WITHOUT
  * re-pairing the old corpus against itself.
  *
  * Index layout (parquet, the durable state between crawls):
  *  - `bands/`    — (doc_id, band, sig): the [[Dedup.bandFrame]] LSH
  *    signatures. Band sigs are built from minhash windows 1-9, which are
  *    prefix-stable under the `minhash18` widening, so stored sigs remain
  *    joinable after a signature-width upgrade.
  *  - `shingles/` — (doc_id, sg): the shingle sets Jaccard verification
  *    reads (at warehouse scale this store is the doc-sketch column of the
  *    corpus table itself; it is materialized here to make the index
  *    self-contained).
  *
  * Per-crawl cost: ONE equi-join of the index's band table against the new
  * batch's bands — O(index x batch collisions), never O(corpus²). The old
  * corpus is re-read (a scan), never re-paired (no A x A candidates).
  * Ingesting the batch is an APPEND of its band/shingle rows — the index
  * delta.
  *
  * Keep/drop semantics: arrival order is priority order — a doc is dropped
  * iff it has a verified match (Jaccard ≥ 0.5) with ANY earlier-arrived
  * doc (earlier batch, or same batch with smaller doc_id), and `dup_of` is
  * its smallest such partner. Because the query splits `documents` into
  * batches BY doc_id (first half = previous crawl), arrival order equals
  * doc_id order and the incremental result is provably identical to the
  * one-shot rule "dropped iff some verified pair (a, doc) with a < doc" —
  * which is exactly what the oracle computes from the full pair table, so
  * the hash match IS the batch-equivalence proof (IncrementalDedupSpec
  * additionally proves it in-engine against [[Dedup.minhashLsh]] pairs).
  */
object IncrementalDedup {

  /** Index root for a given source dir (per-sf so concurrent scale runs
    * never share state).
    */
  private[graft] def indexDir(sfDir: String): String =
    sys.props("java.io.tmpdir") + "/graft_band_index_" +
      sfDir.replaceAll("[^a-zA-Z0-9.]", "_")

  /** The incremental pass over an (old batch, new batch) pair of document
    * frames: (re)writes the index from the old batch, ingests the new
    * batch as an append, and returns the full keep/drop verdict. The old
    * batch's internal pairs are computed the same way the PREVIOUS crawl
    * would have (self-join on its own bands) — phase 2 never generates an
    * old x old candidate.
    */
  private[graft] def dedupBatches(spark: SparkSession, oldDocs: DataFrame,
      newDocs: DataFrame, idx: String): DataFrame = {
    graft.expressions.WordBigrams.register(spark)
    graft.expressions.MinHash9.register(spark)
    val shA = graft.CacheRegistry.persist(Dedup.shingleFrame(oldDocs))
    val bandsA = graft.CacheRegistry.persist(Dedup.bandFrame(shA))
    val shB = graft.CacheRegistry.persist(Dedup.shingleFrame(newDocs))
    val bandsB = graft.CacheRegistry.persist(Dedup.bandFrame(shB))
    // previous crawl: index bootstrap + its own internal dedup
    bandsA.write.mode("overwrite").parquet(s"$idx/bands")
    shA.write.mode("overwrite").parquet(s"$idx/shingles")
    val dropsA = Dedup.jaccardVerify(Dedup.bandCandidates(bandsA, bandsA), shA, shA)
    // this crawl: the index delta is an append of the batch's rows
    bandsB.write.mode("append").parquet(s"$idx/bands")
    shB.write.mode("append").parquet(s"$idx/shingles")
    // one join: full index (old + just-appended batch) x new bands only.
    // doc_a < doc_b inside bandCandidates keeps within-batch pairs oriented
    // and never re-pairs old x old (doc_b is always a batch doc).
    val idxBands = spark.read.parquet(s"$idx/bands")
    val idxSh = spark.read.parquet(s"$idx/shingles")
    val dropsB = Dedup.jaccardVerify(Dedup.bandCandidates(idxBands, bandsB), idxSh, shB)
    val dupOf = dropsA.unionByName(dropsB)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(col("doc_a")).as("dup_of"))
    oldDocs.select("doc_id").unionByName(newDocs.select("doc_id"))
      .join(dupOf, Seq("doc_id"), "left")
      .select(col("doc_id"),
        isnull(col("dup_of")).cast("long").as("is_keeper"),
        coalesce(col("dup_of"), lit(-1L)).cast("long").as("dup_of"))
      .orderBy("doc_id")
  }

  /** Oracled query: documents split at half the max doc id (computed in
    * the plan via a broadcast scalar, no driver collect) — first half is
    * the previous crawl, second half the new batch.
    */
  val incremental: GraftQuery = new GraftQuery {
    val name = "dedup_incremental"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Tables.load(spark, sfDir, "documents")
      val half = docs.agg(floor((max(col("doc_id")) + 1) / 2).cast("long").as("p"))
      val d = docs.crossJoin(broadcast(half))
      val oldDocs = d.filter(col("doc_id") < col("p")).drop("p")
      val newDocs = d.filter(col("doc_id") >= col("p")).drop("p")
      dedupBatches(spark, oldDocs, newDocs, indexDir(sfDir))
    }

    def oracle: Option[String] = Some(Dedup.duckMinhashCtes + """
      , drops AS (
        SELECT doc_b, min(doc_a) AS dup_of
        FROM v WHERE floor(inter * 10000.0 / uni) >= 5000
        GROUP BY doc_b)
      SELECT d.doc_id,
             CAST(CASE WHEN drops.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_keeper,
             CAST(coalesce(drops.dup_of, -1) AS BIGINT) AS dup_of
      FROM documents d
      LEFT JOIN drops ON d.doc_id = drops.doc_b
      ORDER BY d.doc_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(incremental)
}
