package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Tokenizer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL entry surface — the reference's Table/SQL jobs (S2 Kafka DDL
  * tables + registered UDTF, `RT/app/dws/KeywordStatsApp.java:55-91`,
  * `ProvinceStatsSQLApp.java:69-89`): temp views over the sources, the
  * tokenizer registered as a SQL table function, and the query expressed in
  * pure `spark.sql` with `LATERAL VIEW split_words(text)` — the direct
  * analog of Flink's `LATERAL TABLE(split_words(...))`, planned as a native
  * `Generate` over the [[graft.expressions.SplitWords]] Generator (no UDF
  * eval node). Catalyst plans it identically to the DataFrame formulation —
  * demonstrated by sharing the keyword oracle.
  */
object SqlSurface {

  /** A4 in SQL form: tokenize + explode + per-word count over documents. */
  val keywordStatsSql: GraftQuery = new GraftQuery {
    val name = "keyword_stats_sql"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      Tables.registerAll(spark, sfDir)
      Tokenizer.register(spark)
      spark.sql("""
        SELECT word, count(*) AS ct, count(DISTINCT doc_id) AS doc_ct
        FROM documents
        LATERAL VIEW split_words(text) t AS word
        GROUP BY word
        ORDER BY word
      """)
    }

    // same result contract as the DataFrame-built keyword_stats
    def oracle: Option[String] = KeywordStats.keywordStats.oracle
  }

  /** A6: the publisher's derived ratio metrics (pv-per-visit, avg dwell,
    * bounce rate; `PUB/bean/VisitorStats.java:35-64`) over the daily log
    * rollup — floor-scaled so every ratio is integer-exact.
    */
  val dauSummary: GraftQuery = new GraftQuery {
    val name = "ads_dau_summary"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      Tables.registerAll(spark, sfDir)
      LogStats.enriched(spark, sfDir).createOrReplaceTempView("ev_enriched")
      spark.sql("""
        WITH d AS (
          SELECT day,
                 sum(uv_flag) AS uv_ct, count(*) AS pv_ct,
                 sum(entry_flag) AS sv_ct, sum(bounce_flag) AS uj_ct,
                 sum(CAST(value AS DECIMAL(18,2))) AS dur_sum
          FROM ev_enriched GROUP BY day)
        SELECT day, CAST(uv_ct AS BIGINT) AS uv_ct, pv_ct,
               CAST(sv_ct AS BIGINT) AS sv_ct, CAST(uj_ct AS BIGINT) AS uj_ct,
               CAST(dur_sum * 100 AS BIGINT) AS dur_sum_x100,
               CASE WHEN sv_ct > 0 THEN CAST(floor(pv_ct * 100.0 / sv_ct) AS BIGINT) END AS pv_per_visit_x100,
               CASE WHEN sv_ct > 0 THEN CAST(floor(uj_ct * 10000.0 / sv_ct) AS BIGINT) END AS bounce_rate_bp,
               CASE WHEN sv_ct > 0 THEN CAST(floor(CAST(dur_sum AS DOUBLE) * 100.0 / sv_ct) AS BIGINT) END AS avg_dur_x100
        FROM d ORDER BY day
      """)
    }

    def oracle: Option[String] = Some(LogStats.enrichedOracleSql + """
      , d AS (
        SELECT day,
               sum(uv_flag) AS uv_ct, count(*) AS pv_ct,
               sum(entry_flag) AS sv_ct, sum(bounce_flag) AS uj_ct,
               sum(CAST(value AS DECIMAL(18,2))) AS dur_sum
        FROM ev GROUP BY day)
      SELECT day, CAST(uv_ct AS BIGINT) AS uv_ct, pv_ct,
             CAST(sv_ct AS BIGINT) AS sv_ct, CAST(uj_ct AS BIGINT) AS uj_ct,
             CAST(dur_sum * 100 AS BIGINT) AS dur_sum_x100,
             CASE WHEN sv_ct > 0 THEN CAST(floor(pv_ct * 100.0 / sv_ct) AS BIGINT) END AS pv_per_visit_x100,
             CASE WHEN sv_ct > 0 THEN CAST(floor(uj_ct * 10000.0 / sv_ct) AS BIGINT) END AS bounce_rate_bp,
             CASE WHEN sv_ct > 0 THEN CAST(floor(CAST(dur_sum AS DOUBLE) * 100.0 / sv_ct) AS BIGINT) END AS avg_dur_x100
      FROM d ORDER BY day
    """)
  }

  val all: Seq[GraftQuery] = Seq(keywordStatsSql, dauSummary)
}
