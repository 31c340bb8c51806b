package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior-log suite over `events` — the reference's BaseLogApp /
  * UniqueVisitApp / UserJumpDetailApp / VisitorStatsApp chain re-expressed
  * as declarative Spark plans (batch form; the streaming stateful forms
  * live in `graft.streaming` and share these semantics):
  *
  *  - P1 safe parse + route split  (`RT/app/dwd/BaseLogApp.java:46-62,94-144`)
  *  - P3 new-user fixup            (`RT/app/dwd/BaseLogApp.java:65-92`)
  *  - T1 UV first-visit-of-day dedup (`RT/app/dwd/UniqueVisitApp.java:52-90`)
  *  - T2 bounce (jump-out) detection (`RT/app/dwd/UserJumpDetailApp.java:60-108`)
  *  - A1 VisitorStats 3-way union + tumbling window (`RT/app/dws/VisitorStatsApp.java:126-188`)
  *  - A5/A6 hourly rollup + ratio metrics (`PUB/mapper/VisitorStatsMapper.java:12-25`,
  *    `PUB/bean/VisitorStats.java:35-64`)
  *
  * Scale design: every stateful derivation (first-seen, per-day dedup,
  * session gaps) is a window function over ONE hash shuffle on `user_id`;
  * per-day ranks reuse that partition via `lag(day)` instead of a second
  * shuffle on (user_id, day). Gap arithmetic uses the full-precision
  * `ts_ns` long so results are exact and order-independent.
  */
object LogStats {

  private val SessionGapNs = 1800L * 1000000000L // 30 min session boundary
  private val BounceWaitNs = 600L * 1000000000L  // 10 min "no follow-up" wait

  /** events + per-user window derivations (single shuffle on user_id).
    * Materialized once per (session, sfDir) via [[graft.CacheRegistry.shared]]:
    * seven log-suite queries re-aggregate this same derivation, so a harness
    * running the suite computes the scan + window once — the DWD→DWS
    * layering the reference gets from staging through a topic.
    */
  def enriched(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.shared(s"enriched:$sfDir")(enrichedUncached(spark, sfDir))

  private def enrichedUncached(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val wu = Window.partitionBy(col("user_id"))
    Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn_user", row_number().over(w))
      .withColumn("prev_gap_ns", col("ts_ns") - lag(col("ts_ns"), 1).over(w))
      .withColumn("next_gap_ns", lead(col("ts_ns"), 1).over(w) - col("ts_ns"))
      .withColumn("first_day", min(col("day")).over(wu))
      .withColumn("is_new", when(col("day") === col("first_day"), 1).otherwise(0))
      .withColumn("entry_flag",
        when(col("prev_gap_ns").isNull || col("prev_gap_ns") > SessionGapNs, 1).otherwise(0))
      // UV counts a user's first SESSION-ENTRY of each day — the reference's
      // UniqueVisitApp filters lastPageId-empty records before the per-day
      // dedup (`RT/app/dwd/UniqueVisitApp.java:52-90`), and the streaming
      // uniqueVisits op matches (batch/streaming equivalence is spec-checked
      // on the real events table).
      .withColumn("prev_entry_day",
        last(when(col("entry_flag") === 1, col("day")), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("uv_flag",
        when(col("entry_flag") === 1 &&
             (col("prev_entry_day").isNull || col("prev_entry_day") =!= col("day")), 1)
          .otherwise(0))
      .withColumn("bounce_flag",
        when(col("entry_flag") === 1 &&
             (col("next_gap_ns").isNull || col("next_gap_ns") > BounceWaitNs), 1).otherwise(0))
  }

  /** Shared oracle CTE mirroring [[enriched]] exactly. */
  private[operators] val enrichedOracleSql = """
    WITH e AS (
      SELECT *, strftime(ts, '%Y-%m-%d') AS day, epoch_ns(ts) AS tsn FROM events
    ), x AS (
      SELECT e.*,
        row_number() OVER w AS rn_user,
        tsn - lag(tsn) OVER w AS prev_gap_ns,
        lead(tsn) OVER w - tsn AS next_gap_ns,
        min(day) OVER (PARTITION BY user_id) AS first_day
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)
    ), en AS (
      SELECT x.*,
        CASE WHEN day = first_day THEN 1 ELSE 0 END AS is_new,
        CASE WHEN prev_gap_ns IS NULL OR prev_gap_ns > 1800000000000 THEN 1 ELSE 0 END AS entry_flag
      FROM x
    ), en2 AS (
      SELECT en.*,
        last_value(CASE WHEN entry_flag = 1 THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY tsn, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_entry_day
      FROM en
    ), ev AS (
      SELECT en2.*,
        CASE WHEN entry_flag = 1 AND (prev_entry_day IS NULL OR prev_entry_day <> day)
             THEN 1 ELSE 0 END AS uv_flag,
        CASE WHEN entry_flag = 1 AND (next_gap_ns IS NULL OR next_gap_ns > 600000000000)
             THEN 1 ELSE 0 END AS bounce_flag
      FROM en2
    )"""

  /** P1+P4: parse the JSON `props` payload, route records by type (the
    * page/start/display/action/error 3-way+ split), count per route.
    */
  val logSplit: GraftQuery = new GraftQuery {
    val name = "log_split"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("route",
          when(col("event_type") === "view", "dwd_page_log")
            .when(col("event_type") === "signup", "dwd_start_log")
            .when(col("event_type") === "click", "dwd_display_log")
            .when(col("event_type") === "purchase", "dwd_action_log")
            .otherwise("dwd_error_log"))
        .groupBy(col("route"))
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("user_ct"),
          sum(col("k")).as("k_sum"),
          Money.sumCents(col("value")).as("value_sum_x100"))
        .orderBy("route")

    def oracle: Option[String] = Some("""
      SELECT CASE event_type
               WHEN 'view' THEN 'dwd_page_log'
               WHEN 'signup' THEN 'dwd_start_log'
               WHEN 'click' THEN 'dwd_display_log'
               WHEN 'purchase' THEN 'dwd_action_log'
               ELSE 'dwd_error_log' END AS route,
             count(*) AS cnt,
             count(DISTINCT user_id) AS user_ct,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
             CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_sum_x100
      FROM events
      GROUP BY 1 ORDER BY route
    """)
  }

  /** P3: stateful new-user fixup — `is_new` holds only for a user's first
    * ever event; later claims are rewritten. Daily rollup of the result.
    */
  val newUserFix: GraftQuery = new GraftQuery {
    val name = "new_user_fix"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      enriched(spark, sfDir)
        .withColumn("fixed_is_new", when(col("rn_user") === 1, 1).otherwise(0))
        .groupBy(col("day"))
        .agg(
          sum(col("fixed_is_new")).cast("long").as("new_ct"),
          count(lit(1)).as("pv_ct"))
        .orderBy("day")

    def oracle: Option[String] = Some(enrichedOracleSql + """
      SELECT day,
             CAST(sum(CASE WHEN rn_user = 1 THEN 1 ELSE 0 END) AS BIGINT) AS new_ct,
             count(*) AS pv_ct
      FROM ev GROUP BY day ORDER BY day
    """)
  }

  /** T1: unique-visitor dedup — first event per (user, day) survives. */
  val uniqueVisit: GraftQuery = new GraftQuery {
    val name = "unique_visit"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      enriched(spark, sfDir)
        .groupBy(col("day"))
        .agg(sum(col("uv_flag")).cast("long").as("uv_ct"))
        .orderBy("day")

    def oracle: Option[String] = Some(enrichedOracleSql + """
      SELECT day, CAST(sum(uv_flag) AS BIGINT) AS uv_ct
      FROM ev GROUP BY day ORDER BY day
    """)
  }

  /** T2+A6: bounce detection (session entry with no follow-up inside the
    * wait window) + the publisher's ratio metric, floor-scaled to basis
    * points so the value is integer-exact on both engines.
    */
  val bounce: GraftQuery = new GraftQuery {
    val name = "bounce"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      enriched(spark, sfDir)
        .groupBy(col("day"))
        .agg(
          sum(col("entry_flag")).cast("long").as("session_ct"),
          sum(col("bounce_flag")).cast("long").as("bounce_ct"))
        .withColumn("bounce_rate_bp",
          when(col("session_ct") > 0,
            floor(col("bounce_ct") * lit(10000.0) / col("session_ct"))).cast("long"))
        .select("day", "session_ct", "bounce_ct", "bounce_rate_bp")
        .orderBy("day")

    def oracle: Option[String] = Some(enrichedOracleSql + """
      SELECT day,
             CAST(sum(entry_flag) AS BIGINT) AS session_ct,
             CAST(sum(bounce_flag) AS BIGINT) AS bounce_ct,
             CASE WHEN sum(entry_flag) > 0
                  THEN CAST(floor(sum(bounce_flag) * 10000.0 / sum(entry_flag)) AS BIGINT)
             END AS bounce_rate_bp
      FROM ev GROUP BY day ORDER BY day
    """)
  }

  /** A1+P8+T4: VisitorStats — the reference unions three one-hot streams
    * (pv/sv, uv, uj) before a 10 s tumbling window keyed by `is_new`. All
    * three derive from the same enriched event row, so the union is
    * algebraically a single-scan aggregation (each event contributes
    * pv=1, sv=entry, uv=uv_flag, uj=bounce_flag, dur=value to the same
    * (window, is_new) group) — one events scan instead of three at 100 TB.
    * The DuckDB oracle keeps the literal 3-way-union formulation, so the
    * hash match proves the rewrite equivalent.
    */
  val visitorStats: GraftQuery = new GraftQuery {
    val name = "visitor_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      enriched(spark, sfDir)
        .groupBy(window(col("ts"), "10 seconds"), col("is_new"))
        .agg(
          sum(col("uv_flag")).cast("long").as("uv_ct"),
          count(lit(1)).as("pv_ct"),
          sum(col("entry_flag")).cast("long").as("sv_ct"),
          sum(col("bounce_flag")).cast("long").as("uj_ct"),
          Money.sumCents(col("value")).as("dur_sum_x100"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("is_new"), col("uv_ct"), col("pv_ct"), col("sv_ct"), col("uj_ct"), col("dur_sum_x100"))
        .orderBy("stt", "is_new")

    def oracle: Option[String] = Some(enrichedOracleSql + """
      , u AS (
        SELECT ts, is_new, 1 AS pv, 0 AS uv, entry_flag AS sv, 0 AS uj,
               CAST(value AS DECIMAL(18,2)) AS dur FROM ev
        UNION ALL
        SELECT ts, is_new, 0, 1, 0, 0, CAST(0 AS DECIMAL(18,2)) FROM ev WHERE uv_flag = 1
        UNION ALL
        SELECT ts, is_new, 0, 0, 0, 1, CAST(0 AS DECIMAL(18,2)) FROM ev WHERE bounce_flag = 1
      )
      SELECT strftime(make_timestamp((epoch_ns(ts) // 10000000000) * 10000000), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(make_timestamp((epoch_ns(ts) // 10000000000) * 10000000 + 10000000), '%Y-%m-%d %H:%M:%S') AS edt,
             is_new,
             CAST(sum(uv) AS BIGINT) AS uv_ct,
             CAST(sum(pv) AS BIGINT) AS pv_ct,
             CAST(sum(sv) AS BIGINT) AS sv_ct,
             CAST(sum(uj) AS BIGINT) AS uj_ct,
             CAST(sum(dur) * 100 AS BIGINT) AS dur_sum_x100
      FROM u GROUP BY 1, 2, 3 ORDER BY stt, is_new
    """)
  }

  /** A5 hourly rollup: uv/pv and new-user uv per (day, hour) — the
    * publisher's `sum(if(is_new='1',uv_ct,0))` hourly query.
    */
  val hourlyVisitors: GraftQuery = new GraftQuery {
    val name = "hourly_visitors"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      enriched(spark, sfDir)
        .groupBy(col("day"), hour(col("ts")).cast("long").as("hr"))
        .agg(
          AggMode.distinctCount(spark, col("user_id")).as("uv_ct"),
          count(lit(1)).as("pv_ct"),
          AggMode.distinctCount(spark,
            when(col("is_new") === 1, col("user_id"))).as("new_uv_ct"))
        .orderBy("day", "hr")

    def oracle: Option[String] = Some(enrichedOracleSql + """
      SELECT day, CAST(hour(ts) AS BIGINT) AS hr,
             count(DISTINCT user_id) AS uv_ct,
             count(*) AS pv_ct,
             count(DISTINCT CASE WHEN is_new = 1 THEN user_id END) AS new_uv_ct
      FROM ev GROUP BY 1, 2 ORDER BY day, hr
    """)
  }

  /** Native session-window aggregation — Spark's `session_window` merges a
    * user's events closer than the 30-minute gap into one session (end =
    * last event + gap), the first-class form of the gap heuristics the
    * enriched view derives with lag(). The oracle reconstructs sessions by
    * gap-splitting over a cumulative entry counter; `session_window` opens
    * a new session at gap ≥ 30 min while the split uses the same ≥ at
    * micros precision (the testdata has no exact-30-minute micros gap, so
    * the boundary convention cannot diverge). Scale shape: one shuffle on
    * user_id, sessions assembled inside the aggregation.
    */
  val sessionStats: GraftQuery = new GraftQuery {
    val name = "session_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(
          count(lit(1)).as("ev_ct"),
          Money.sumCents(col("value")).as("value_sum_x100"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("ev_ct"), col("value_sum_x100"))
        .orderBy("user_id", "stt")

    def oracle: Option[String] = Some("""
      WITH x AS (
        SELECT user_id, ts, value, event_id, epoch_us(ts) AS tsu FROM events),
      g AS (
        -- event_id tiebreak: a parallel window evaluation over PEER rows
        -- (tied tsu) was measured to return run-varying results in the
        -- oracle engine (see span_coverage); a total ORDER BY removes
        -- peers, and session membership is tie-invariant anyway
        SELECT x.*, CASE WHEN tsu - lag(tsu) OVER w IS NULL
                          OR tsu - lag(tsu) OVER w >= 1800000000
                         THEN 1 ELSE 0 END AS new_session
        FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)),
      s AS (
        SELECT g.*, sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM g),
      agg AS (
        SELECT user_id, sid, min(ts) AS start_ts, max(ts) AS end_ts,
               count(*) AS ev_ct,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_sum_x100
        FROM s GROUP BY 1, 2)
      SELECT user_id,
             strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(end_ts + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS edt,
             ev_ct, value_sum_x100
      FROM agg ORDER BY user_id, stt
    """)
  }

  /** Sliding (hopping) window visitors — completes the tumbling
    * (`visitor_stats`) / sliding / session (`session_stats`) window trio.
    * Native `window(ts, size, slide)`: Catalyst expands each event into
    * size/slide = 2 window rows before ONE aggregation (the same bounded
    * fan-out shape as `rolling_actives`); the oracle derives the same two
    * epoch-aligned starts with floor arithmetic.
    */
  val slidingVisitors: GraftQuery = new GraftQuery {
    val name = "sliding_visitors"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(countDistinct(col("user_id")).as("uv_ct"),
          count(lit(1)).as("pv_ct"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("uv_ct"), col("pv_ct"))
        .orderBy("stt")

    def oracle: Option[String] = Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
      w AS (SELECT user_id,
                   (tu // 300000000) * 300000000 - k * 300000000 AS ws
            FROM e CROSS JOIN (VALUES (0), (1)) AS ks(k))
      SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(make_timestamp(ws + 600000000), '%Y-%m-%d %H:%M:%S')
               AS edt,
             count(DISTINCT user_id) AS uv_ct,
             count(*) AS pv_ct
      FROM w GROUP BY ws ORDER BY stt
    """)
  }

  val all: Seq[GraftQuery] =
    Seq(logSplit, newUserFix, uniqueVisit, bounce, visitorStats, hourlyVisitors,
      sessionStats, slidingVisitors)
}
