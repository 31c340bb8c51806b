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
  /** Delete the index root — the bootstrap of a fresh crawl sequence. */
  private[graft] def clearIndex(spark: SparkSession, idx: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(idx)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
    ()
  }

  /** Read one index table, or a schema-stable empty frame when the index
    * does not exist yet (the first crawl). The reader frame lists files at
    * CREATION time, so a frame created here never sees rows appended
    * afterwards — callers rely on that to dedup a batch against the index
    * state BEFORE the batch's own append.
    */
  private def readIndexOr(spark: SparkSession, dir: String,
      empty: DataFrame): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.parquet(dir) else empty
  }

  /** Ingest ONE arriving batch: dedup it against the persisted index state
    * plus the batch itself (within-batch pairs stay oriented by
    * doc_a < doc_b), append the batch's band/shingle rows as the index
    * delta, and return the batch's verdict `(doc_id, is_keeper, dup_of)`.
    * This is the unit both the batch query ([[dedupBatches]]) and the
    * streaming twin ([[graft.streaming.DedupStream]]) run per
    * crawl/micro-batch; the contract is arrival order = doc_id order (ids
    * assigned monotonically across crawls), which is what makes the
    * incremental result provably identical to the one-shot "dropped iff
    * some verified pair (a, doc) with a < doc" rule.
    */
  private[graft] def ingestBatch(spark: SparkSession, docs: DataFrame,
      idx: String): DataFrame = {
    graft.expressions.WordBigrams.register(spark)
    graft.expressions.MinHash9.register(spark)
    val sh = graft.CacheRegistry.persist(Dedup.shingleFrame(docs))
    val bands = graft.CacheRegistry.persist(Dedup.bandFrame(sh))
    // pre-append index state (empty on the first crawl)
    val emptyBands = spark.range(0).select(col("id").as("doc_id"),
      lit(1).as("band"), lit("").as("sig"))
    val emptySh = spark.range(0).select(col("id").as("doc_id"),
      array().cast("array<string>").as("sg"))
    val idxBands = readIndexOr(spark, s"$idx/bands", emptyBands)
    val idxSh = readIndexOr(spark, s"$idx/shingles", emptySh)
    // one join: (index ∪ batch) bands x batch bands only — never re-pairs
    // index x index (doc_b is always a batch doc)
    val drops = Dedup.jaccardVerify(
      Dedup.bandCandidates(idxBands.unionByName(bands), bands),
      idxSh.unionByName(sh), sh)
    // the index delta — appended AFTER the drop plan captured its
    // pre-append file listing, so the verdict stays vs prior state even
    // though it executes lazily at the caller's action
    bands.write.mode("append").parquet(s"$idx/bands")
    sh.write.mode("append").parquet(s"$idx/shingles")
    val dupOf = drops
      .groupBy(col("doc_b").as("doc_id"))
      .agg(min(col("doc_a")).as("dup_of"))
    docs.select("doc_id")
      .join(dupOf, Seq("doc_id"), "left")
      .select(col("doc_id"),
        isnull(col("dup_of")).cast("long").as("is_keeper"),
        coalesce(col("dup_of"), lit(-1L)).cast("long").as("dup_of"))
  }

  /** The incremental pass over an (old batch, new batch) pair of document
    * frames: bootstrap a fresh index, ingest the old batch (the previous
    * crawl — its verdict is its own internal dedup, exactly as that crawl
    * would have computed it), then ingest the new batch against the
    * resulting index. Two [[ingestBatch]] calls; phase 2 never generates
    * an old x old candidate.
    */
  private[graft] def dedupBatches(spark: SparkSession, oldDocs: DataFrame,
      newDocs: DataFrame, idx: String): DataFrame = {
    clearIndex(spark, idx)
    val vOld = ingestBatch(spark, oldDocs, idx)
    val vNew = ingestBatch(spark, newDocs, idx)
    vOld.unionByName(vNew).orderBy("doc_id")
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
