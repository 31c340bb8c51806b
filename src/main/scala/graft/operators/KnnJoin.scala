package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus×corpus k-nearest-neighbor JOIN — the all-queries counterpart of
  * the `ann_*` family (where a 10-vector query set probes the corpus, here
  * EVERY vector is a query). This is the primitive a clustering /
  * SemDeDup / label-propagation pipeline actually runs at scale: "for each
  * of n documents, its top-k most similar documents", n² pairs naively.
  *
  * Shape (the 100 TB design): centers are the k = ⌈√n⌉ lowest vec_ids
  * (in-plan broadcast aggregate, no training step — same contract as
  * `dedup_semantic`), every vector is indexed under its best-cosine cell
  * (broadcast assign, map-only) and probes its top-2 cells, so the
  * candidate generator is ONE equi-join on the cell id producing
  * ~2·n·√n pairs instead of n² — and the cell key grows with the corpus,
  * so partitions stay bounded. Scoring, per-query ranking and the top-3
  * cut ride the same shuffle. No all-pairs anywhere: the exact-truth side
  * of [[knnRecall]] brute-forces a ~6% DETERMINISTIC SAMPLE of queries
  * (vec_id ≡ 0 mod 17) against the corpus as a broadcast nested loop —
  * cost linear in n, never quadratic.
  *
  * Reference anchor: the reference engine has no neighbor-join operator;
  * this extends its ANN surface (SURVEY §2 LLM-pipeline block) the way a
  * training-data pipeline needs it.
  */
object KnnJoin {

  /** Top-3 neighbors for every vector via √n-cell IVF blocking, shared
    * across the three queries in this module (`CacheRegistry.shared` —
    * `ann_knn_join` emits it, `ann_knn_recall` audits it, `knn_classify`
    * votes over it).
    */
  private[graft] def knnRows(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"knn:$sfDir") {
      val e = Similarity.vecs(spark, sfDir)
      val cents = e.join(broadcast(Dedup.sqrtCount(e)))
        .filter(col("vec_id") < col("k"))
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val ranked = Similarity.cellRanked(e, cents)
      val corpusCell = ranked.filter(col("crank") === 1)
        .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
      val queryProbe = ranked.filter(col("crank") <= 2)
        .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
      // project the vectors AWAY before the rank window: the candidate
      // frame is ~2·n·√n rows, and carrying two 64-dim doubles per row is
      // ~50x the bytes of the (query, neighbor, score) triple. The
      // `rank <= 3` filter then rewrites to a PARTIAL WindowGroupLimit
      // (visible in the plan): each map partition keeps only its own top-3
      // per query BEFORE the exchange, so the window shuffle is bounded at
      // ~3 rows per (query, partition) — the map-side-combine of top-k.
      val scored = queryProbe.as("q")
        .join(corpusCell.as("c"),
          col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          floor(expr("dot_double(q.v, c.v)") * lit(10000.0) /
            (col("q.nrm") * col("c.nrm"))).cast("long").as("cos_bp"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_bp").desc, col("neighbor_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"), col("cos_bp"))
    }

  /** DuckDB mirror of [[knnRows]] — emits CTE `knn(query_id, neighbor_id,
    * rank, cos_bp)`; includes the leading `WITH`.
    */
  private def duckKnnCte: String = """
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      cents AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
        WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM n)),
      assign AS (
        SELECT n.vec_id, n.v, n.nrm, cents.cid,
               CAST(floor(list_sum(list_transform(generate_series(1, len(n.v)),
                      i -> n.v[i] * cents.cv[i])) * 10000.0 / (n.nrm * cents.cnrm)) AS BIGINT) AS ccos_bp
        FROM n CROSS JOIN cents),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos_bp DESC, cid) AS crank
        FROM assign),
      corpus AS (SELECT vec_id, v, nrm, cid AS cell FROM ranked WHERE crank = 1),
      qp AS (SELECT vec_id, v, nrm, cid AS cell FROM ranked WHERE crank <= 2),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                      i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) AS cos_bp
        FROM qp q JOIN corpus c ON q.cell = c.cell AND q.vec_id <> c.vec_id),
      knn AS (
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_bp FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY cos_bp DESC, neighbor_id) AS rank
          FROM scored)
        WHERE rank <= 3)"""

  /** The neighbor join itself: (query_id, neighbor_id, rank, cos_bp) for
    * every vector in the corpus.
    */
  val knnJoin: GraftQuery = new GraftQuery {
    val name = "ann_knn_join"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      knnRows(spark, sfDir).orderBy("query_id", "rank")

    def oracle: Option[String] = Some(duckKnnCte + """
      SELECT * FROM knn ORDER BY query_id, rank
    """)
  }

  /** Recall@3 of the blocked neighbor join against brute-force truth, on
    * the deterministic ~6% query sample (vec_id ≡ 0 mod 17). The truth
    * side broadcasts the SAMPLE against one corpus scan — linear cost, so
    * the audit itself scales; left join from truth so a query whose probe
    * cells held no candidates still reports recall 0.
    */
  val knnRecall: GraftQuery = new GraftQuery {
    val name = "ann_knn_recall"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = Similarity.vecs(spark, sfDir)
      val q = e.filter(col("vec_id") % 17 === 0)
      // same column-slimming as [[knnRows]]: score in the scan, shuffle
      // only the id/score triple into the rank window. The corpus side
      // widens to session parallelism FIRST — this broadcast brute pass is
      // CPU-dense map-only work (|sample| dots per corpus row) running on
      // the cached frame's 1-2 scan partitions; without the exchange it
      // saturated two cores (52.7 s on the 10x fixture, ~3 s widened).
      val scored = e.repartition(spark.sparkContext.defaultParallelism).as("c")
        .join(broadcast(q.as("q")), col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          floor(expr("dot_double(q.v, c.v)") * lit(10000.0) /
            (col("q.nrm") * col("c.nrm"))).cast("long").as("cos_bp"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_bp").desc, col("neighbor_id"))
      val truth = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("neighbor_id"))
      val got = knnRows(spark, sfDir)
        .filter(col("query_id") % 17 === 0)
        .select(col("query_id").as("g_query"), col("neighbor_id").as("g_neighbor"))
      truth
        .join(got, col("query_id") === col("g_query") &&
          col("neighbor_id") === col("g_neighbor"), "left")
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("truth_k"),
          count(col("g_neighbor")).as("hits"))
        .withColumn("recall_bp",
          floor(col("hits") * lit(10000.0) / col("truth_k")).cast("long"))
        .orderBy("query_id")
    }

    def oracle: Option[String] = Some(duckKnnCte + """,
      brute AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                        i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) DESC,
                   c.vec_id) AS rank
          FROM n q JOIN n c ON q.vec_id % 17 = 0 AND q.vec_id <> c.vec_id)
        WHERE rank <= 3)
      SELECT b.query_id,
             count(*) AS truth_k,
             count(k.neighbor_id) AS hits,
             CAST(floor(count(k.neighbor_id) * 10000.0 / count(*)) AS BIGINT) AS recall_bp
      FROM brute b LEFT JOIN knn k
        ON b.query_id = k.query_id AND b.neighbor_id = k.neighbor_id
           AND k.query_id % 17 = 0
      GROUP BY 1 ORDER BY b.query_id
    """)
  }

  /** k-NN majority-vote label classification over the blocked neighbor
    * join — the embeddings table's `label` column predicted for every
    * vector from its top-3 neighbors' labels (votes desc, then smallest
    * label breaks ties). The per-query accuracy flag makes the output a
    * self-auditing confusion surface: `correct` sums to the corpus
    * accuracy. All post-join work is one groupBy on (query, label) — at
    * 100 TB the vote rides the neighbor join's existing shuffle key.
    */
  val knnClassify: GraftQuery = new GraftQuery {
    val name = "knn_classify"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = Similarity.vecs(spark, sfDir)
      val labels = e.select(col("vec_id"), col("label").cast("long").as("lbl"))
      val votes = knnRows(spark, sfDir)
        .join(labels.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy(col("query_id"), col("lbl"))
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("lbl"))
      votes
        .withColumn("vrank", row_number().over(w))
        .filter(col("vrank") === 1)
        .join(labels.withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("lbl", "true_label"), "query_id")
        .select(col("query_id").as("vec_id"),
          col("true_label"),
          col("lbl").as("pred_label"),
          col("votes"),
          when(col("lbl") === col("true_label"), lit(1L)).otherwise(lit(0L))
            .as("correct"))
        .orderBy("vec_id")
    }

    def oracle: Option[String] = Some(duckKnnCte + """,
      labels AS (SELECT vec_id, CAST(label AS BIGINT) AS lbl FROM embeddings),
      votes AS (
        SELECT k.query_id, l.lbl, count(*) AS votes
        FROM knn k JOIN labels l ON k.neighbor_id = l.vec_id
        GROUP BY 1, 2),
      pred AS (
        SELECT query_id, lbl, votes FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY votes DESC, lbl) AS vrank
          FROM votes)
        WHERE vrank = 1)
      SELECT p.query_id AS vec_id,
             t.lbl AS true_label,
             p.lbl AS pred_label,
             p.votes,
             CAST(CASE WHEN p.lbl = t.lbl THEN 1 ELSE 0 END AS BIGINT) AS correct
      FROM pred p JOIN labels t ON p.query_id = t.vec_id
      ORDER BY vec_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(knnJoin, knnRecall, knnClassify)
}
