package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions.duckHash16
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - `ann_topk`: brute-force cosine top-k — the exactness baseline. The
  *    query set (vec_id < 10) is broadcast against the corpus, so the scan
  *    is one pass, embarrassingly parallel, no shuffle of the corpus.
  *  - `ann_lsh`: the scale path — random-hyperplane LSH. Hyperplane
  *    components are derived deterministically from md5(plane_dim) so both
  *    engines (and every executor) agree without shipping a model: bucket =
  *    sign-bit string of 6 hyperplane dots. Search touches only the query's
  *    bucket (~1/64 of the corpus; at 100 TB the bucket join is an
  *    equi-shuffle on the bucket id, never a cross join).
  *
  * Scores are floor-scaled to basis points BEFORE ranking, and ties break
  * on vec_id, so the top-k set is deterministic on any engine/partitioning.
  */
object Similarity {

  private val Planes = 6
  private val Dims = 64

  /** vectors as double arrays + L2 norm (norm = sqrt of self-dot via the
    * codegen'd [[graft.expressions.DotProductDouble]] — same left-to-right
    * summation as the interpreted `aggregate` fold it replaces).
    */
  private def vecs(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.DotProductDouble.register(spark)
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(expr("dot_double(v, v)")))
  }

  private def cosBp(a: String, b: String) =
    floor(expr(s"dot_double($a.v, $b.v)") *
      lit(10000.0) / (col(s"$a.nrm") * col(s"$b.nrm"))).cast("long")

  /** Brute-force cosine top-5 for each query vector (vec_id < 10). */
  val annTopK: GraftQuery = new GraftQuery {
    val name = "ann_topk"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = vecs(spark, sfDir)
      val q = e.filter(col("vec_id") < 10)
      val scored = q.as("q")
        .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .withColumn("cos_bp", cosBp("q", "c"))
      val w = Window.partitionBy(col("q.vec_id"))
        .orderBy(col("cos_bp").desc, col("c.vec_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("cos_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                      i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) AS cos_bp
        FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_bp DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_bp
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """)
  }

  /** LSH-bucketed ANN: 6 deterministic pseudo-random hyperplanes, search
    * within the query's sign bucket only, top-3 per query.
    */
  val annLsh: GraftQuery = new GraftQuery {
    val name = "ann_lsh"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      // hyperplane weights w(p,d) ∈ [-32767.5, 32767.5], derived from md5
      val planes = broadcast(
        (0 until Planes).flatMap(p => (1 to Dims).map(d => (p, d))).toDF("p", "d")
          .withColumn("w",
            conv(substring(md5(concat_ws("_", col("p"), col("d"))), 1, 4), 16, 10)
              .cast("double") - lit(32767.5)))
      val e = vecs(spark, sfDir)
      val byDim = e.select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .withColumn("d", col("pos") + 1)
      val buckets = byDim.join(planes, "d")
        .groupBy(col("vec_id"), col("p"))
        .agg(sum(col("x") * col("w")).as("dot"))
        .groupBy(col("vec_id"))
        .agg(sum(when(col("dot") > 0, expr("CAST(power(2, p) AS BIGINT)")).otherwise(0L))
          .as("bucket"))
      val withBucket = e.join(buckets, "vec_id")
      val q = withBucket.filter(col("vec_id") < 10)
      val scored = q.as("q")
        .join(withBucket.as("c"),
          col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
        .withColumn("cos_bp", cosBp("q", "c"))
      val w = Window.partitionBy(col("q.vec_id"))
        .orderBy(col("cos_bp").desc, col("c.vec_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          col("rank").cast("long").as("rank"), col("cos_bp"))
        .orderBy("query_id", "rank")
    }

    def oracle: Option[String] = {
      val w = duckHash16("CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)")
      Some(s"""
      WITH planes AS (
        SELECT p, d, $w - 32767.5 AS w
        FROM generate_series(0, ${Planes - 1}) t1(p), generate_series(1, $Dims) t2(d)),
      e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      n AS (
        SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      byd AS (
        SELECT vec_id, d, v[d] AS x FROM e, generate_series(1, $Dims) t(d)),
      dots AS (
        SELECT vec_id, p, sum(x * w) AS dot
        FROM byd JOIN planes USING (d) GROUP BY 1, 2),
      buckets AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dot > 0 THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY 1),
      nb AS (SELECT n.*, b.bucket FROM n JOIN buckets b USING (vec_id)),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(floor(list_sum(list_transform(generate_series(1, len(q.v)),
                      i -> q.v[i] * c.v[i])) * 10000.0 / (q.nrm * c.nrm)) AS BIGINT) AS cos_bp
        FROM nb q JOIN nb c
          ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_bp DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_bp
      FROM ranked WHERE rank <= 3 ORDER BY query_id, rank
      """)
    }
  }

  val all: Seq[GraftQuery] = Seq(annTopK, annLsh)
}
