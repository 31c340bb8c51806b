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

  /** The 3-stage conversion funnel in pure SQL — the chained
    * sequential-min CTE form (the exact shape the DataFrame funnel's
    * window chain computes, and the DuckDB oracle's own formulation).
    * Each stage CTE is a tiny per-user aggregate equi-joined back on
    * user_id, so at scale the joins hash on the one funnel key and the
    * scalar-subquery counts broadcast. Oracled against the SAME oracle as
    * `funnel_conversion` — the two surfaces cannot drift.
    */
  val funnelSql: GraftQuery = new GraftQuery {
    val name = "funnel_sql"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      Tables.registerAll(spark, sfDir)
      val w = Behavior.FunnelWindowNs
      spark.sql(s"""
        WITH ev AS (SELECT user_id, event_type, ts_ns AS tsn FROM events),
        s1 AS (SELECT user_id, min(tsn) AS t1 FROM ev
               WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT ev.user_id, min(tsn) AS t2 FROM ev
               JOIN s1 USING (user_id)
               WHERE event_type = 'click'
                 AND tsn > s1.t1 AND tsn <= s1.t1 + $w GROUP BY 1),
        s3 AS (SELECT ev.user_id, min(tsn) AS t3 FROM ev
               JOIN s2 USING (user_id) JOIN s1 ON ev.user_id = s1.user_id
               WHERE event_type = 'purchase'
                 AND tsn > s2.t2 AND tsn <= s1.t1 + $w GROUP BY 1),
        u AS (SELECT (SELECT count(*) FROM s1) AS u1,
                     (SELECT count(*) FROM s2) AS u2,
                     (SELECT count(*) FROM s3) AS u3)
        SELECT CAST(stage AS BIGINT) AS stage, stage_name,
               CAST(users AS BIGINT) AS users,
               CAST(floor(users * 10000.0 / u1) AS BIGINT) AS conv_total_bp,
               CASE WHEN prev > 0
                    THEN CAST(floor(users * 10000.0 / prev) AS BIGINT)
               END AS conv_step_bp
        FROM (SELECT 1 AS stage, 'view' AS stage_name, u1 AS users, u1 AS prev, u1 FROM u
              UNION ALL SELECT 2, 'click', u2, u1, u1 FROM u
              UNION ALL SELECT 3, 'purchase', u3, u2, u1 FROM u)
        WHERE u1 > 0
        ORDER BY stage
      """)
    }

    def oracle: Option[String] = Behavior.funnelConversion.oracle
  }

  /** DAU/WAU in pure SQL — the same bounded-fan-out shape as the
    * DataFrame `rolling_actives` (each distinct (day, user) row explodes
    * to its ≤7 window-end days; the tiny day grid joins broadcast), NOT
    * the range self-join a naive SQL translation would produce. Shares
    * `rolling_actives`' oracle.
    */
  val rollingActivesSql: GraftQuery = new GraftQuery {
    val name = "rolling_actives_sql"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      Tables.registerAll(spark, sfDir)
      spark.sql("""
        WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                    FROM events),
        days AS (SELECT DISTINCT day FROM du),
        w AS (SELECT date_add(du.day, k.k) AS wday, du.user_id
              FROM du LATERAL VIEW explode(sequence(0, 6)) k AS k),
        wau AS (SELECT w.wday AS day, count(DISTINCT w.user_id) AS wau_ct
                FROM w JOIN days ON days.day = w.wday GROUP BY 1),
        dau AS (SELECT day, count(DISTINCT user_id) AS dau_ct FROM du GROUP BY 1)
        SELECT date_format(wau.day, 'yyyy-MM-dd') AS day, dau.dau_ct, wau.wau_ct
        FROM wau JOIN dau ON wau.day = dau.day
        ORDER BY day
      """)
    }

    def oracle: Option[String] = Behavior.rollingActives.oracle
  }

  /** As-of last-touch attribution in pure SQL — the union-merge as-of
    * (tag both sides, one (user) window ordered by (time, side, id), a
    * running `last(..., ignoreNulls)` carries the latest preceding touch
    * onto each purchase row). ONE shuffle on user_id, identical to the
    * DataFrame `asofMatch`; shares `asof_attribution`'s DuckDB
    * `ASOF LEFT JOIN` oracle, so the SQL surface is held to the native
    * as-of semantics.
    */
  val asofSql: GraftQuery = new GraftQuery {
    val name = "asof_sql"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      Tables.registerAll(spark, sfDir)
      spark.sql("""
        WITH touches AS (
          SELECT user_id, unix_micros(ts) AS tsu, event_id AS ord,
                 event_type AS touch_type, props AS touch_props
          FROM events WHERE event_type IN ('view', 'click')),
        p AS (
          SELECT user_id, unix_micros(ts) AS tsu, event_id, value
          FROM events WHERE event_type = 'purchase'),
        u AS (
          SELECT user_id, tsu, 0 AS side, ord, touch_type,
                 CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value
          FROM touches
          UNION ALL
          SELECT user_id, tsu, 1, event_id, NULL, event_id, value FROM p),
        m AS (
          SELECT *, last(touch_type, true) OVER w AS m_type,
                 last(CASE WHEN side = 0 THEN tsu END, true) OVER w AS m_tsu
          FROM u
          WINDOW w AS (PARTITION BY user_id ORDER BY tsu, side, ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT coalesce(m_type, 'none') AS touch_type,
               count(*) AS purchase_ct,
               count(DISTINCT user_id) AS user_ct,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents,
               CAST(coalesce(sum(tsu - m_tsu), 0) AS BIGINT) AS gap_us_sum,
               CAST(sum(event_id) AS BIGINT) AS id_sum
        FROM m WHERE side = 1
        GROUP BY 1 ORDER BY touch_type
      """)
    }

    def oracle: Option[String] = Temporal.asofAttribution.oracle
  }

  val all: Seq[GraftQuery] =
    Seq(keywordStatsSql, dauSummary, funnelSql, rollingActivesSql, asofSql)
}
