package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions.{duckHashHex, hash24}
import org.apache.spark.sql.Column
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for a training-data pipeline.
  *
  * Reproducibility is the contract: the keep/drop decision is a pure
  * function of the record key (md5-derived, engine-portable), never engine
  * RNG — re-running the pipeline, on any cluster, selects the identical
  * sample, and downstream joins against previously sampled snapshots stay
  * consistent.
  */
object Sampling {

  /** Per-stratum sampling rates in basis points — a tiny config table
    * broadcast into the decision join (the dict-dim pattern): even-numbered
    * sources keep 25%, odd-numbered 75%.
    */
  private[graft] val rateRows: Seq[(String, Int)] =
    Seq.tabulate(20)(i => (s"src$i", if (i % 2 == 0) 2500 else 7500))

  /** The portable keep/drop hash: [[hash24]] of the id mod 10000 — ONE
    * definition shared by the oracle-checked queries and the pipeline, so
    * every component selects the identical sample.
    */
  private[graft] def sampleHash(id: Column): Column =
    hash24(id.cast("string")) % 10000

  /** Salted split hash — the "split:" salt decorrelates it from
    * [[sampleHash]] (kept documents must not skew toward one split).
    */
  private[graft] def splitHash(id: Column): Column =
    hash24(concat(lit("split:"), id.cast("string"))) % 10000

  /** Append the `split` column by [[splitHash]] against the broadcast
    * [lo, hi) boundaries — the single implementation `split_assign`
    * verifies and `tools.LlmPipeline` reuses.
    */
  private[graft] def withSplit(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val splits = splitRows.toDF("split", "lo_bp", "hi_bp")
    df.withColumn("split_h", splitHash(col("doc_id")))
      .join(broadcast(splits),
        col("split_h") >= col("lo_bp") && col("split_h") < col("hi_bp"))
      .drop("split_h", "lo_bp", "hi_bp")
  }

  /** Stratified sampling: keep a document iff
    * `md5_24(doc_id) mod 10000 < rate_bp(source)`. One scan, broadcast
    * rate join, no shuffle before the per-stratum accounting — at 100 TB
    * the decision is a codegen'd projection. Output is the per-stratum
    * audit: population, sample size, configured rate, realized rate and a
    * kept-id checksum proving the exact selection cross-engine.
    */
  val stratified: GraftQuery = new GraftQuery {
    val name = "sample_stratified"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val rates = rateRows.toDF("source", "rate_bp")
      Tables.load(spark, sfDir, "documents")
        .withColumn("h", sampleHash(col("doc_id")))
        .join(broadcast(rates), "source")
        .withColumn("keep", (col("h") < col("rate_bp")).cast("int"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("population_ct"),
          sum(col("keep")).cast("long").as("sample_ct"),
          min(col("rate_bp")).cast("long").as("rate_bp"),
          sum(when(col("keep") === 1, col("doc_id"))).cast("long").as("kept_id_sum"))
        .withColumn("realized_bp",
          floor(col("sample_ct") * lit(10000.0) / col("population_ct")).cast("long"))
        .orderBy("source")
    }

    def oracle: Option[String] = {
      val vals = rateRows.map { case (s, r) => s"('$s', $r)" }.mkString(", ")
      Some(s"""
      WITH rates(source, rate_bp) AS (VALUES $vals),
      d AS (
        SELECT doc_id, documents.source, rate_bp,
               ${duckHashHex("CAST(doc_id AS VARCHAR)", 6)} % 10000 AS h
        FROM documents JOIN rates ON documents.source = rates.source),
      k AS (SELECT *, CASE WHEN h < rate_bp THEN 1 ELSE 0 END AS keep FROM d)
      SELECT source,
             count(*) AS population_ct,
             CAST(sum(keep) AS BIGINT) AS sample_ct,
             CAST(min(rate_bp) AS BIGINT) AS rate_bp,
             CAST(sum(CASE WHEN keep = 1 THEN doc_id END) AS BIGINT) AS kept_id_sum,
             CAST(floor(sum(keep) * 10000.0 / count(*)) AS BIGINT) AS realized_bp
      FROM k GROUP BY source ORDER BY source
      """)
    }
  }

  /** Train/val/test split boundaries in hash basis points: [lo, hi). */
  private[graft] val splitRows: Seq[(String, Int, Int)] =
    Seq(("train", 0, 9000), ("val", 9000, 9500), ("test", 9500, 10000))

  /** Deterministic train/val/test SPLIT assignment — the companion of
    * [[stratified]] on the other side of selection: every kept document
    * lands in exactly one split by `md5_24("split:" + doc_id) mod 10000`
    * against broadcast [lo, hi) boundaries. The salt decorrelates the
    * split hash from the sampling hash (otherwise "kept" documents would
    * skew toward one split). One scan, codegen'd decision, no shuffle
    * before the per-split audit; the id checksum proves the exact
    * assignment cross-engine, so a re-run on any cluster regenerates the
    * identical split.
    */
  val splitAssign: GraftQuery = new GraftQuery {
    val name = "split_assign"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Tables.load(spark, sfDir, "documents")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      withSplit(docs)
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("doc_ct"),
          sum(col("n_chars")).cast("long").as("char_ct"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .crossJoin(broadcast(n))
        .withColumn("share_bp",
          floor(col("doc_ct") * lit(10000.0) / col("n_docs")).cast("long"))
        .select("split", "doc_ct", "char_ct", "id_checksum", "share_bp")
        .orderBy("split")
    }

    def oracle: Option[String] = {
      val vals = splitRows.map { case (s, lo, hi) => s"('$s', $lo, $hi)" }.mkString(", ")
      Some(s"""
      WITH splits(split, lo_bp, hi_bp) AS (VALUES $vals),
      d AS (
        SELECT doc_id, n_chars,
               ${duckHashHex("'split:' || CAST(doc_id AS VARCHAR)", 6)} % 10000 AS h
        FROM documents),
      a AS (
        SELECT split, doc_id, n_chars
        FROM d JOIN splits ON h >= lo_bp AND h < hi_bp),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT split,
             count(*) AS doc_ct,
             CAST(sum(n_chars) AS BIGINT) AS char_ct,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             CAST(floor(count(*) * 10000.0 / n.n_docs) AS BIGINT) AS share_bp
      FROM a CROSS JOIN n GROUP BY split, n.n_docs ORDER BY split
      """)
    }
  }

  /** Target mixture weights in basis points per source (sum = 10000) —
    * the "data mixing" config between quality filtering and packing.
    */
  private[graft] val mixtureRows: Seq[(String, Int)] =
    Seq.tabulate(20)(i => (s"src$i", ((i % 4) + 1) * 200))

  /** Budget = this share of the corpus's total tokens (basis points). */
  private[graft] val budgetShareBp = 5000

  /** Mixture keep/drop hash — "mix:"-salted so the mixture decision is
    * independent of both the sampling and split hashes.
    */
  private[graft] def mixHash(id: Column): Column =
    hash24(concat(lit("mix:"), id.cast("string"))) % 10000

  /** Per-source mixture rates for a documents frame carrying `tok_ct`:
    * the token budget is `budgetShareBp` of the corpus total; source s
    * gets `weight_bp(s)` of it; its keep rate is target/available, capped
    * at 1. Two scans total at any scale: one tiny groupBy for per-source
    * availability (its result and the corpus total are broadcast back),
    * then the caller's decision scan — the decision itself is a codegen'd
    * projection against the broadcast rate table, exactly like
    * [[stratified]].
    */
  private[graft] def mixtureRates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val weights = mixtureRows.toDF("source", "weight_bp")
    val avail = docs.groupBy("source").agg(sum(col("tok_ct")).as("avail_tokens"))
    val total = docs.agg(sum(col("tok_ct")).as("total_tokens"))
    avail.crossJoin(broadcast(total))
      .join(broadcast(weights), "source")
      .withColumn("target_tokens",
        floor(col("total_tokens") * col("weight_bp") * lit(budgetShareBp.toDouble) /
          lit(1e8)).cast("long"))
      .withColumn("rate_bp",
        least(lit(10000L),
          floor(col("target_tokens") * lit(10000.0) / col("avail_tokens"))).cast("long"))
      .select("source", "avail_tokens", "target_tokens", "rate_bp")
  }

  /** Filter a documents frame (must carry `tok_ct`) to the mixture sample
    * — the pipeline-stage form; [[mixture]] is the audited query form.
    */
  private[graft] def applyMixture(docs: DataFrame): DataFrame =
    docs.join(broadcast(mixtureRates(docs)), "source")
      .filter(mixHash(col("doc_id")) < col("rate_bp"))
      .drop("avail_tokens", "target_tokens", "rate_bp")

  /** Data-mixture sampling — the "mixing weights" step of a training-data
    * pipeline: re-weight sources toward a target composition under a
    * global token budget. Deterministic like its siblings: the keep set
    * is a pure salted-hash function of doc ids and the broadcast config.
    * Output is the per-source audit: available vs target vs realized
    * tokens (realized tracks target only as closely as doc-granularity
    * hash selection allows — the realized_vs_target_bp column IS that
    * sampling-error measurement) plus the kept-id checksum proving the
    * exact selection cross-engine.
    */
  val mixture: GraftQuery = new GraftQuery {
    val name = "sample_mixture"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // EXACT BPE token counts (round 8): mixture targets are token
      // budgets, so they should be counted in trainer tokens; docs with
      // no tokens keep tok_ct 0 via the left join
      val base = Tables.load(spark, sfDir, "documents")
      val docs = graft.CacheRegistry.persist(base
        .join(graft.functions.Bpe.docCountsShared(spark, sfDir), Seq("doc_id"), "left")
        .withColumn("tok_ct", coalesce(col("bpe_ct"), lit(0L)))
        .drop("bpe_ct"))
      docs.join(broadcast(mixtureRates(docs)), "source")
        .withColumn("keep", (mixHash(col("doc_id")) < col("rate_bp")).cast("int"))
        .groupBy(col("source"))
        .agg(
          min(col("avail_tokens")).as("avail_tokens"),
          min(col("target_tokens")).as("target_tokens"),
          min(col("rate_bp")).as("rate_bp"),
          sum(col("keep")).cast("long").as("kept_docs"),
          coalesce(sum(when(col("keep") === 1, col("tok_ct"))), lit(0L))
            .cast("long").as("kept_tokens"),
          coalesce(sum(when(col("keep") === 1, col("doc_id"))), lit(0L))
            .cast("long").as("kept_id_sum"))
        .withColumn("realized_vs_target_bp",
          floor(col("kept_tokens") * lit(10000.0) /
            greatest(col("target_tokens"), lit(1L))).cast("long"))
        .orderBy("source")
    }

    def oracle: Option[String] = {
      val vals = mixtureRows.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
      Some(graft.functions.Bpe.duckToksRecursiveCte +
        graft.functions.Bpe.duckBpeCtes + s"""
      , weights(source, weight_bp) AS (VALUES $vals),
      d AS (SELECT doc_id, source, COALESCE(bpe.bpe_ct, 0) AS tok_ct,
                   ${duckHashHex("'mix:' || CAST(doc_id AS VARCHAR)", 6)} % 10000 AS h
            FROM toks LEFT JOIN bpe USING (doc_id)),
      avail AS (SELECT source, sum(tok_ct) AS avail_tokens FROM d GROUP BY source),
      tot AS (SELECT sum(tok_ct) AS total_tokens FROM d),
      rates AS (
        SELECT source, avail_tokens,
               CAST(floor(total_tokens * weight_bp * ${budgetShareBp}.0 / 100000000.0) AS BIGINT) AS target_tokens
        FROM avail CROSS JOIN tot JOIN weights USING (source)),
      r2 AS (
        SELECT *, least(10000, CAST(floor(target_tokens * 10000.0 / avail_tokens) AS BIGINT)) AS rate_bp
        FROM rates),
      k AS (
        SELECT d.source, avail_tokens, target_tokens, rate_bp, tok_ct, doc_id,
               CASE WHEN h < rate_bp THEN 1 ELSE 0 END AS keep
        FROM d JOIN r2 ON d.source = r2.source)
      SELECT source,
             CAST(min(avail_tokens) AS BIGINT) AS avail_tokens,
             CAST(min(target_tokens) AS BIGINT) AS target_tokens,
             CAST(min(rate_bp) AS BIGINT) AS rate_bp,
             CAST(sum(keep) AS BIGINT) AS kept_docs,
             CAST(coalesce(sum(CASE WHEN keep = 1 THEN tok_ct END), 0) AS BIGINT) AS kept_tokens,
             CAST(coalesce(sum(CASE WHEN keep = 1 THEN doc_id END), 0) AS BIGINT) AS kept_id_sum,
             CAST(floor(coalesce(sum(CASE WHEN keep = 1 THEN tok_ct END), 0) * 10000.0 /
               greatest(min(target_tokens), 1)) AS BIGINT) AS realized_vs_target_bp
      FROM k GROUP BY source ORDER BY source
      """)
    }
  }

  /** Shard count of [[corpusShard]] — a config in production (one shard
    * per training data-loader worker), a fixture constant here.
    */
  private[graft] val ShardCount = 8

  /** Deterministic SHARD + TRAINING-ORDER assignment — the last step
    * before a training job consumes the corpus: every document lands in
    * exactly one of [[ShardCount]] shards (salted hash, decorrelated
    * from the sampling/split/mixture hashes), and WITHIN its shard gets
    * a reproducible shuffle position (order by a second salted hash,
    * doc_id tie-break). Re-running on any cluster regenerates the
    * identical read order — the property that makes a training run
    * resumable and an ablation comparable. Output is the per-shard
    * audit: document/token counts and an ORDER-SENSITIVE checksum
    * (md5 over the doc-id sequence IN shuffLE ORDER), so the oracle
    * match proves the exact permutation, not just the membership.
    *
    * Shape: two codegen'd hash projections, one groupBy(shard) whose
    * collect_list sorts per shard — at 100 TB the real op materializes
    * the order as a per-shard sort (exactly the distributed sort you
    * want: partition by shard, sort within partitions, write); the
    * audit form here aggregates the same permutation into a checksum.
    */
  val corpusShard: GraftQuery = new GraftQuery {
    val name = "corpus_shard"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("tok_ct"),
          (hash24(concat(lit("shard:"), col("doc_id").cast("string"))) % ShardCount)
            .cast("long").as("shard"),
          hash24(concat(lit("order:"), col("doc_id").cast("string"))).as("ord"))
        .groupBy("shard")
        .agg(
          count(lit(1)).as("docs"),
          sum(col("tok_ct")).cast("long").as("tokens"),
          md5(concat_ws(",",
            transform(array_sort(collect_list(struct(col("ord"), col("doc_id")))),
              p => p.getField("doc_id").cast("string")))).as("order_md5"))
        .orderBy("shard")

    def oracle: Option[String] = Some(
      graft.functions.TextFunctions.duckToksCte + s"""
      , d AS (
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS tok_ct,
               ${duckHashHex("'shard:' || CAST(doc_id AS VARCHAR)", 6)} % $ShardCount AS shard,
               ${duckHashHex("'order:' || CAST(doc_id AS VARCHAR)", 6)} AS ord
        FROM toks)
      SELECT CAST(shard AS BIGINT) AS shard,
             count(*) AS docs,
             CAST(sum(tok_ct) AS BIGINT) AS tokens,
             md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY ord, doc_id)) AS order_md5
      FROM d GROUP BY shard ORDER BY shard
    """)
  }

  /** Salted acceptance hash for importance sampling — "imp:" decorrelates
    * it from the stratified-sampling and split hashes (a document's
    * quality-weighted keep decision must not bias which split it lands
    * in).
    */
  private[graft] def impHash(id: Column): Column =
    hash24(concat(lit("imp:"), id.cast("string"))) % 10000

  /** Quality-weighted IMPORTANCE sampling (the DSIR-style move — Xie et
    * al. 2023, arXiv:2302.03169 — with the classifier score as the
    * log-importance weight): each document's acceptance rate is
    * `clamp(5000 + qx1m/200, 500, 10000)` basis points — the
    * [[graft.operators.Relevance.qualityFrame]] score mapped linearly
    * from its (−1e6, 1e6) range onto (0, 10000), floored at 5% so no
    * stratum is ever fully extinguished — and the keep decision is the
    * salted hash acceptance `impHash(doc_id) < rate_bp`. Everything is
    * one codegen'd scan: score, rate and decision are projections; the
    * only shuffle is the per-source audit aggregation (fine source key,
    * map-side combine). Deterministic cross-engine: re-running on any
    * cluster reproduces the identical sample (the kept-id checksum proves
    * the exact selection).
    */
  val importance: GraftQuery = new GraftQuery {
    val name = "sample_importance"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Relevance.qualityFrame(spark, sfDir)
        .withColumn("rate_bp",
          greatest(lit(500L), least(lit(10000L),
            lit(5000L) + floor(col("qx1m") / lit(200.0)).cast("long"))))
        .withColumn("keep", (impHash(col("doc_id")) < col("rate_bp")).cast("int"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("population_ct"),
          sum(col("keep")).cast("long").as("sample_ct"),
          sum(col("rate_bp")).cast("long").as("sum_rate_bp"),
          sum(when(col("keep") === 1, col("doc_id"))).cast("long").as("kept_id_sum"))
        .withColumn("realized_bp",
          floor(col("sample_ct") * lit(10000.0) / col("population_ct")).cast("long"))
        .orderBy("source")

    def oracle: Option[String] = Some(Relevance.duckQualityCte + s""",
      r AS (
        SELECT doc_id, source,
               greatest(500, least(10000,
                 5000 + CAST(floor(qx1m / 200.0) AS BIGINT))) AS rate_bp,
               ${duckHashHex("'imp:' || CAST(doc_id AS VARCHAR)", 6)} % 10000 AS h
        FROM q),
      k AS (SELECT *, CASE WHEN h < rate_bp THEN 1 ELSE 0 END AS keep FROM r)
      SELECT source,
             count(*) AS population_ct,
             CAST(sum(keep) AS BIGINT) AS sample_ct,
             CAST(sum(rate_bp) AS BIGINT) AS sum_rate_bp,
             CAST(sum(CASE WHEN keep = 1 THEN doc_id END) AS BIGINT) AS kept_id_sum,
             CAST(floor(sum(keep) * 10000.0 / count(*)) AS BIGINT) AS realized_bp
      FROM k GROUP BY source ORDER BY source
    """)
  }

  /** LEAKAGE-SAFE train/val/test split — the eval-integrity companion of
    * [[splitAssign]]: hashing DOCUMENT ids scatters the members of a
    * near-dup cluster across splits, quietly leaking train content into
    * val/test (a paraphrase of a training doc in the eval set is
    * contamination the span checks can't see once wording drifts).
    * Splitting by the CLUSTER label instead — connected-component id from
    * `dedup_clusters`, singletons labeling themselves — pins every member
    * of a cluster to one split by construction.
    *
    * The guarantee is EMITTED, not claimed: `safe_leaky_clusters` counts
    * clusters spanning >1 split under this assignment (must be 0, and the
    * oracle recomputes it), while `naive_leaky_clusters` counts what
    * doc-id hashing would have leaked on this corpus — the measured size
    * of the problem this operator removes.
    *
    * Scale shape: cluster labels ride the dedup machinery (banded LSH +
    * path doubling); the labeled corpus is persisted once (it feeds the
    * safe assignment, the naive diagnostic and the audit — the
    * scan-audit rule); both split decisions are broadcast-joined
    * codegen'd projections; all counters are map-combinable aggregates.
    */
  val splitLeakageSafe: GraftQuery = new GraftQuery {
    val name = "split_leakage_safe"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val docs = Tables.load(spark, sfDir, "documents")
      val labels = Dedup.clusters.run(spark, sfDir)
        .select(col("doc_id"), col("cluster_id"))
      val labeled = graft.CacheRegistry.persist(
        docs.select("doc_id")
          .join(labels, Seq("doc_id"), "left")
          .withColumn("cluster_id",
            coalesce(col("cluster_id"), col("doc_id"))))
      val splits = splitRows.toDF("split", "lo_bp", "hi_bp")
      val assigned = labeled
        .withColumn("split_h", splitHash(col("cluster_id")))
        .join(broadcast(splits),
          col("split_h") >= col("lo_bp") && col("split_h") < col("hi_bp"))
      val naiveLeaky = labeled
        .withColumn("split_h", splitHash(col("doc_id")))
        .join(broadcast(splits),
          col("split_h") >= col("lo_bp") && col("split_h") < col("hi_bp"))
        .groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("k"))
        .agg(sum(when(col("k") > 1, 1L).otherwise(0L)).as("naive_leaky_clusters"))
      val safeLeaky = assigned
        .groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("k"))
        .agg(sum(when(col("k") > 1, 1L).otherwise(0L)).as("safe_leaky_clusters"))
      assigned
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("doc_ct"),
          countDistinct(col("cluster_id")).as("cluster_ct"),
          sum(col("doc_id")).cast("long").as("id_checksum"))
        .join(broadcast(safeLeaky))
        .join(broadcast(naiveLeaky))
        .select("split", "doc_ct", "cluster_ct", "id_checksum",
          "safe_leaky_clusters", "naive_leaky_clusters")
        .orderBy("split")
    }

    def oracle: Option[String] = {
      val vals = splitRows.map { case (s, lo, hi) => s"('$s', $lo, $hi)" }.mkString(", ")
      Some(Dedup.duckMinhashCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
      , dup AS (
        SELECT doc_a, doc_b FROM v WHERE floor(inter * 10000.0 / uni) >= 5000),
      edges AS (
        SELECT doc_a AS s, doc_b AS t FROM dup
        UNION ALL SELECT doc_b, doc_a FROM dup),
      reach(s, t) AS (
        SELECT s, t FROM edges
        UNION
        SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
      lbl AS (
        SELECT s AS doc_id, least(s, min(t)) AS cluster_id
        FROM reach GROUP BY s),
      labeled AS (
        SELECT d.doc_id, coalesce(lbl.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN lbl ON lbl.doc_id = d.doc_id),
      splits(split, lo_bp, hi_bp) AS (VALUES $vals),
      assigned AS (
        SELECT labeled.*, split
        FROM labeled JOIN splits
          ON ${duckHashHex("'split:' || CAST(cluster_id AS VARCHAR)", 6)} % 10000 >= lo_bp
         AND ${duckHashHex("'split:' || CAST(cluster_id AS VARCHAR)", 6)} % 10000 < hi_bp),
      naive AS (
        SELECT labeled.*, split
        FROM labeled JOIN splits
          ON ${duckHashHex("'split:' || CAST(doc_id AS VARCHAR)", 6)} % 10000 >= lo_bp
         AND ${duckHashHex("'split:' || CAST(doc_id AS VARCHAR)", 6)} % 10000 < hi_bp),
      safe_leak AS (
        SELECT CAST(count(*) FILTER (k > 1) AS BIGINT) AS safe_leaky_clusters
        FROM (SELECT cluster_id, count(DISTINCT split) AS k
              FROM assigned GROUP BY 1)),
      naive_leak AS (
        SELECT CAST(count(*) FILTER (k > 1) AS BIGINT) AS naive_leaky_clusters
        FROM (SELECT cluster_id, count(DISTINCT split) AS k
              FROM naive GROUP BY 1))
      SELECT split, count(*) AS doc_ct,
             count(DISTINCT cluster_id) AS cluster_ct,
             CAST(sum(doc_id) AS BIGINT) AS id_checksum,
             safe_leaky_clusters, naive_leaky_clusters
      FROM assigned CROSS JOIN safe_leak CROSS JOIN naive_leak
      GROUP BY split, safe_leaky_clusters, naive_leaky_clusters
      ORDER BY split
      """)
    }
  }

  val all: Seq[GraftQuery] =
    Seq(stratified, splitAssign, mixture, corpusShard, importance,
      splitLeakageSafe)
}
