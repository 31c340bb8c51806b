package graft.operators

import graft.{CacheRegistry, GraftQuery}
import graft.functions.TextFunctions.{duckHashHex, hash24}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-driven corpus curation — the "cluster, then curate" stage of a
  * training-data pipeline: k-means topic discovery over embeddings,
  * cluster-balanced resampling of over-represented topics, and
  * centroid-distance outlier filtering. This is the curation recipe behind
  * SemDeDup's cluster-then-prune (Abbas et al. 2023, arXiv:2303.09540) and
  * the cluster-balanced pool sampling in DataComp-LM (Li et al. 2024); the
  * reference engine stops at per-key aggregation and has no embedding
  * surface, so these extend it rather than mirror it.
  *
  * All three queries share ONE trained model: [[Similarity.lloydCenters]]
  * ([[Iters]] exact Lloyd steps, decimal-sum centers) over the planted-
  * cluster fixture ([[Similarity.clusteredVecs]] — the testdata embeddings
  * are near-orthogonal, so topic recovery needs data WITH topics; the
  * fixture's true topic of vector v is v % [[K]], giving the purity audit
  * a ground truth). Seeds are vec_ids 0..K-1 — one per planted cluster by
  * construction, so the trained centers should purify to the true topics,
  * and `cluster_topics.purity_bp` MEASURES that they do.
  *
  * Scale shape: training is the IVF loop's (map-only broadcast assignment
  * through the codegen'd TopCells kernel + one (cell, dim) fine-key
  * exchange per Lloyd step); the curation passes are one broadcast join
  * (K-row rate table) plus one groupBy(cell) exchange each. Nothing here
  * ever shuffles vector payloads except the per-step refine explode, and
  * K ≈ √n keeps the center table broadcast-range at any corpus (~31k
  * centers for 10⁹ vectors).
  */
object ClusterCurate {

  /** Planted-cluster count — matches the fixture's vec_id % 8 topics. */
  private[graft] val K = 8

  /** Lloyd steps — also the oracle's unroll depth; early convergence is
    * result-identical to the fixed unroll (an unchanged assignment
    * reproduces the same decimal sums and therefore the same centers).
    */
  private[graft] val Iters = 2

  /** Global outlier budget for `embed_outliers`. */
  private[graft] val OutlierN = 25

  /** Train k centers on any `(vec_id, v, nrm)` frame (seeds = the first k
    * vec_ids) and return the trained per-vector assignment
    * `(vec_id, true_label, cell, ccos_bp)` — the queries bind it to the
    * planted fixture; `tools.ClusterScaleProbe` reuses it at synthetic
    * corpus sizes with k scaled √n-style.
    */
  private[graft] def trainOn(e: DataFrame, k: Int): DataFrame = {
    val seeds = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    val (centers, _) = Similarity.lloydCenters(e, seeds, Iters)
    Similarity.cellRanked(e, centers).filter(col("crank") === 1)
      .select(col("vec_id"), (col("vec_id") % k).as("true_label"),
        col("cid").as("cell"), col("ccos_bp"))
  }

  /** The trained assignment over the planted fixture — shared by all three
    * queries (one training run per session/sfDir, slim id-only cache).
    */
  private[graft] def trainedCells(spark: SparkSession, sfDir: String): DataFrame =
    CacheRegistry.shared(s"clusterCurate:$sfDir") {
      trainOn(CacheRegistry.persist(Similarity.clusteredVecs(spark, sfDir)), K)
    }

  /** Shared DuckDB prefix: the identical fixture + [[Iters]]-step Lloyd
    * unroll, ending in `fin(vec_id, true_label, cell, ccos_bp)`.
    */
  private def finCte: String = s"""
      WITH e AS (${Similarity.duckClusteredVecs}),
      n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      cents0n AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE vec_id < $K),
      ${(0 until Iters).map(Similarity.duckLloydStep).mkString(",")},
      fassign AS (
        SELECT n.vec_id, c.cid,
               CAST(floor(list_sum(list_transform(generate_series(1, 64),
                      i -> n.v[i] * c.cv[i])) * 10000.0 / (n.nrm * c.cnrm)) AS BIGINT) AS ccos_bp
        FROM n CROSS JOIN cents${Iters}n c),
      fin AS (
        SELECT vec_id, vec_id % $K AS true_label, cid AS cell, ccos_bp FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                      ORDER BY ccos_bp DESC, cid) AS crank
          FROM fassign) WHERE crank = 1)"""

  /** Per-cluster topic card: size, dominant true topic, purity against it
    * and mean member-to-centroid cosine — the audit a curation run reads
    * before trusting cluster-level decisions. Dominant label ties break to
    * the smaller label; the mean rides an exact BIGINT sum of the
    * floor-scaled per-member cosines, so both engines divide the same two
    * integers.
    */
  val topics: GraftQuery = new GraftQuery {
    val name = "cluster_topics"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val ta = trainedCells(spark, sfDir)
      val byLab = ta.groupBy(col("cell"), col("true_label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("cell"))
        .orderBy(col("cnt").desc, col("true_label"))
      val dom = byLab.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cell"), col("true_label").as("dominant_label"),
          col("cnt").as("domcnt"))
      ta.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_members"), sum(col("ccos_bp")).as("s"))
        .join(dom, "cell")
        .select(col("cell"), col("n_members"), col("dominant_label"),
          floor(col("domcnt") * lit(10000.0) / col("n_members")).cast("long").as("purity_bp"),
          floor(col("s") * lit(1.0) / col("n_members")).cast("long").as("avg_cos_bp"))
        .orderBy(col("cell"))
    }

    def oracle: Option[String] = Some(s"""
      $finCte,
      bylab AS (
        SELECT cell, true_label, count(*) AS cnt FROM fin GROUP BY 1, 2),
      dom AS (
        SELECT cell, true_label AS dominant_label, cnt AS domcnt FROM (
          SELECT *, row_number() OVER (PARTITION BY cell
                      ORDER BY cnt DESC, true_label) AS rn
          FROM bylab) WHERE rn = 1),
      base AS (
        SELECT cell, count(*) AS n_members, sum(ccos_bp) AS s
        FROM fin GROUP BY 1)
      SELECT base.cell, n_members, CAST(dominant_label AS BIGINT) AS dominant_label,
             CAST(floor(domcnt * 10000.0 / n_members) AS BIGINT) AS purity_bp,
             CAST(floor(s * 1.0 / n_members) AS BIGINT) AS avg_cos_bp
      FROM base JOIN dom ON base.cell = dom.cell
      ORDER BY base.cell""")
  }

  /** Cluster-balanced resampling: every cluster is downsampled toward the
    * uniform target cap = ceil(total / K) by the engine-portable
    * md5-derived keep hash ("bal:" salt — decorrelated from the other
    * sampling decisions, same discipline as [[Sampling]]). Clusters at or
    * under the cap keep everything (keep_bp clamps at 10000). Output is
    * the per-cluster audit with a kept-id checksum proving the EXACT
    * selection cross-engine. The decision is a codegen'd projection after
    * a K-row broadcast join — at 100 TB this is one scan plus one
    * K-group aggregation.
    */
  val balance: GraftQuery = new GraftQuery {
    val name = "cluster_balance_sample"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      balanceOn(trainedCells(spark, sfDir), K)

    def oracle: Option[String] = Some(s"""
      $finCte,
      sizes AS (SELECT cell, count(*) AS n_total FROM fin GROUP BY 1),
      tot AS (SELECT sum(n_total) AS tot FROM sizes),
      rates AS (
        SELECT cell, n_total,
               least(10000, CAST(floor(CAST(ceil(tot * 1.0 / $K) AS BIGINT)
                 * 10000.0 / n_total) AS BIGINT)) AS keep_bp
        FROM sizes CROSS JOIN tot),
      d AS (
        SELECT fin.vec_id, fin.cell, n_total, keep_bp,
               ${duckHashHex("'bal:' || CAST(vec_id AS VARCHAR)", 6)} % 10000 AS h
        FROM fin JOIN rates ON fin.cell = rates.cell)
      SELECT cell,
             CAST(max(n_total) AS BIGINT) AS n_total,
             CAST(max(keep_bp) AS BIGINT) AS keep_bp,
             CAST(sum(CASE WHEN h < keep_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             CAST(sum(CASE WHEN h < keep_bp THEN vec_id ELSE 0 END) AS BIGINT) AS kept_vec_sum
      FROM d GROUP BY cell ORDER BY cell""")
  }

  /** The balance pass body over any trained assignment — also the probe's
    * curate stage. One K-row broadcast rate join + one groupBy(cell).
    */
  private[graft] def balanceOn(ta: DataFrame, k: Int): DataFrame = {
    val sizes = ta.groupBy(col("cell")).agg(count(lit(1)).as("n_total"))
    val tot = sizes.agg(sum(col("n_total")).as("tot"))
    val rates = sizes.crossJoin(broadcast(tot))
      .withColumn("cap", ceil(col("tot") * lit(1.0) / lit(k)))
      .withColumn("keep_bp", least(lit(10000L),
        floor(col("cap") * lit(10000.0) / col("n_total")).cast("long")))
      .select(col("cell"), col("n_total"), col("keep_bp"))
    ta.join(broadcast(rates), "cell")
      .withColumn("h",
        hash24(concat(lit("bal:"), col("vec_id").cast("string"))) % 10000)
      .withColumn("keep", (col("h") < col("keep_bp")).cast("long"))
      .groupBy(col("cell"))
      .agg(max(col("n_total")).as("n_total"),
        max(col("keep_bp")).as("keep_bp"),
        sum(col("keep")).as("n_kept"),
        sum(when(col("keep") === 1, col("vec_id")).otherwise(lit(0L))).as("kept_vec_sum"))
      .orderBy(col("cell"))
  }

  /** Embedding-space outlier filter: the [[OutlierN]] vectors LEAST
    * cosine-similar to their own trained centroid (global bottom-k, ties
    * to the smaller vec_id) — the "prune the points far from every
    * cluster" step that removes mislabeled/garbage embeddings before
    * cluster-level curation. TakeOrderedAndProject over the slim trained
    * frame: no full sort materializes at any scale.
    */
  val outliers: GraftQuery = new GraftQuery {
    val name = "embed_outliers"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      trainedCells(spark, sfDir)
        .orderBy(col("ccos_bp").asc, col("vec_id"))
        .limit(OutlierN)
        .select(col("vec_id"), col("cell"), col("true_label"), col("ccos_bp"))

    def oracle: Option[String] = Some(s"""
      $finCte
      SELECT vec_id, cell, true_label, ccos_bp FROM fin
      ORDER BY ccos_bp, vec_id LIMIT $OutlierN""")
  }

  /** Medoid budget per cluster for `cluster_medoids`. */
  private[graft] val MedoidN = 3

  /** Cluster representatives: per cluster, the [[MedoidN]] members CLOSEST
    * to their centroid (ties to the smaller vec_id) — the "show me what
    * this cluster is" inspection card curation reviews read, and the
    * complement of [[outliers]]. One window over the slim trained frame,
    * partitioned on the cell key (k ≈ √n groups at scale — never a
    * single-partition sort).
    */
  val medoids: GraftQuery = new GraftQuery {
    val name = "cluster_medoids"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy(col("cell"))
        .orderBy(col("ccos_bp").desc, col("vec_id"))
      trainedCells(spark, sfDir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= MedoidN)
        .select(col("cell"), col("rank").cast("long").as("rank"),
          col("vec_id"), col("true_label"), col("ccos_bp"))
        .orderBy(col("cell"), col("rank"))
    }

    def oracle: Option[String] = Some(s"""
      $finCte,
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY cell
                    ORDER BY ccos_bp DESC, vec_id) AS rank
        FROM fin)
      SELECT cell, CAST(rank AS BIGINT) AS rank, vec_id, true_label, ccos_bp
      FROM ranked WHERE rank <= $MedoidN ORDER BY cell, rank""")
  }

  val all: Seq[GraftQuery] = Seq(topics, balance, outliers, medoids)
}
