package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus analytics a training-data pipeline runs at selection time:
  * TF-IDF term relevance and exact discrete percentiles. Both are fully
  * deterministic cross-engine: TF-IDF scores are floor-scaled after a
  * shared `ln` formulation; percentiles are positional (value at
  * ceil(q*n) in a total order), never interpolated.
  */
object Relevance {

  /** Top-3 TF-IDF terms per document: tf(d,w) * ln(N/df(w)), floor-scaled.
    * One explode pass feeds both the tf and df aggregations; df and the
    * corpus size join back on the word key (broadcast at any realistic
    * vocabulary size).
    */
  val tfidfTop: GraftQuery = new GraftQuery {
    val name = "tfidf_top_terms"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val docs = Tables.load(spark, sfDir, "documents")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(df), "word").crossJoin(broadcast(n))
        .withColumn("score_x1000",
          floor(col("tf") * log(col("n_docs") * lit(1.0) / col("df")) * lit(1000.0))
            .cast("long"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_x1000").desc, col("word"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("word"), col("tf"), col("df"), col("score_x1000"))
        .orderBy("doc_id", "rank")
    }

    def oracle: Option[String] = Some(duckToksCte + """
      , ex AS (SELECT doc_id, unnest(ws) AS word FROM toks),
      tf AS (SELECT doc_id, word, count(*) AS tf FROM ex GROUP BY 1, 2),
      df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.word, tf.tf, df.df,
               CAST(floor(tf.tf * ln(n.n_docs * 1.0 / df.df) * 1000.0) AS BIGINT) AS score_x1000
        FROM tf JOIN df USING (word) CROSS JOIN n),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score_x1000 DESC, word) AS rank
        FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, word, tf, df, score_x1000
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
    """)
  }

  /** Exact discrete percentiles of `value` per event type: the value at
    * position ceil(q*n) in the (value, event_id) total order — positional,
    * so the doubles are actual input values, bit-equal on any engine.
    */
  val percentiles: GraftQuery = new GraftQuery {
    val name = "event_value_percentiles"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      val wn = Window.partitionBy(col("event_type"))
      def pick(q: Double) =
        max(when(col("rn") === greatest(lit(1L), ceil(col("n") * lit(q))), col("value")))
      Tables.load(spark, sfDir, "events")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
        .orderBy("event_type")
    }

    def oracle: Option[String] = Some("""
      WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events)
      SELECT event_type, count(*) AS n,
             max(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.5) AS BIGINT)) THEN value END) AS p50,
             max(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.9) AS BIGINT)) THEN value END) AS p90,
             max(CASE WHEN rn = greatest(1, CAST(ceil(n * 0.99) AS BIGINT)) THEN value END) AS p99
      FROM r GROUP BY event_type ORDER BY event_type
    """)
  }

  val all: Seq[GraftQuery] = Seq(tfidfTop, percentiles)
}
