package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior analytics over the events stream: windowed funnel, cohort
  * retention, session-gap transition matrix, rolling active users.
  *
  * The reference's ADS layer stops at per-window visitor/product rollups
  * (the `PUB/mapper` Java mappers); these are the next queries a warehouse
  * user asks
  * of the same events table. All four are exact-integer end to end
  * (basis-point ratios via floor, ns timestamps via `ts_ns`) so the DuckDB
  * oracle hash-matches bit for bit.
  *
  * Scale shapes (the 100 TB contract):
  *  - funnel: ONE shuffle on user_id; per-stage entry times come from n
  *    chained conditional-min window passes over that one exchange (the
  *    array-free `windowFunnel` shape) — no per-user array is ever
  *    materialized, so a whale key spills in WindowExec instead of
  *    growing an aggregation buffer.
  *  - cohort: two key-aligned shuffles (min-per-user, then the activity
  *    groupBy); the per-cell matrix is |weeks|² rows — tiny at any scale.
  *  - transitions: one user_id window shuffle; the (src,dst) grid is
  *    |event_type|² — constant.
  *  - rolling actives: the window expansion happens on the PRE-AGGREGATED
  *    distinct (day,user) frame (bounded 7× fan-out), never on raw
  *    events; one aggregation carries both counters (DAU = the k=0
  *    slice) — no day-grid join, no range self-join of the fact table.
  */
object Behavior {

  /** Funnel completion window: each later stage must land within 72 h of
    * the stage-1 entry (and strictly after the previous stage). Shared
    * with the streaming twin (`streaming.StatefulOps.funnelProgress`).
    */
  private[graft] val FunnelWindowNs = 72L * 3600 * 1000 * 1000 * 1000

  /** Session gap for the transition matrix — same 30 min the session
    * window family uses (`LogStats.sessionStats`). Shared with the
    * streaming twin (`streaming.StatefulOps.transitionPairs`).
    */
  private[graft] val GapNs = 30L * 60 * 1000 * 1000 * 1000

  /** Per-user staged entry times from a (user_id, stage, tsn) frame —
    * the ARRAY-FREE chained sequential-min form (the same shape the
    * DuckDB oracle's CTE chain uses): t1 = min stage-1 time; t(k) =
    * min stage-k time strictly after t(k-1) and within t1's window.
    * Because t(k-1) is the min over its own qualifying set, "first
    * qualifying event in time order" and "min over the qualifying set"
    * are the same value, stage by stage, by induction — identical to
    * the old sorted-array left fold, without ever materializing a
    * per-user array.
    *
    * Scale shape: ONE hashpartitioning(user_id) exchange; the n window
    * passes and the final per-user collapse all reuse it (window needs
    * only the partition keys sorted, and the groupBy's distribution is
    * already satisfied). Per-task memory is one user's rows in
    * WindowExec's spillable buffer — a whale user degrades to disk
    * spill, where `collect_list` would hold the whole key's array in
    * the aggregation buffer (the round-6 watch item).
    */
  private[graft] def funnelTimes(ev: DataFrame, n: Int = 3,
      windowNs: Long = FunnelWindowNs): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val staged = (1 to n).foldLeft(ev) { case (df, k) =>
      val qualifies =
        if (k == 1) col("stage") === 1
        else col("stage") === k && col(s"t${k - 1}").isNotNull &&
          col("tsn") > col(s"t${k - 1}") &&
          col("tsn") <= col("t1") + lit(windowNs)
      df.withColumn(s"t$k", min(when(qualifies, col("tsn"))).over(w))
    }
    // t1..tn are constant per user after the window passes; min() is just
    // the deterministic collapse back to one row per user
    staged.groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"),
        (2 to n).map(k => min(col(s"t$k")).as(s"t$k")): _*)
  }

  /** An n-stage conversion-funnel query over the events table: per-stage
    * reached-user counts with floor-bp conversion from the funnel entry
    * and from the previous stage. Both the Spark fold and the DuckDB
    * oracle's sequential-min CTE chain are GENERATED from the ordered
    * stage-type list, so any funnel a user defines gets the same oracle
    * coverage as the shipped instances.
    */
  private[graft] def funnelQuery(qname: String, stageTypes: Seq[String],
      windowNs: Long): GraftQuery = new GraftQuery {
    // a repeated event type is an unsupported config: the DataFrame fold
    // maps it to the LAST matching stage, the SQL CASE to the first, and
    // the oracle counts it at every stage — fail loudly instead of
    // letting the three surfaces silently disagree
    require(stageTypes.distinct.size == stageTypes.size,
      s"funnel stage types must be distinct, got $stageTypes")
    val name = qname
    private val n = stageTypes.length

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val stageCol = stageTypes.zipWithIndex
        .foldLeft(lit(null).cast("int")) { case (acc, (t, i)) =>
          when(col("event_type") === t, lit(i + 1)).otherwise(acc)
        }
      val ev = Tables.load(spark, sfDir, "events")
        .select(col("user_id"), stageCol.as("stage"), col("ts_ns").as("tsn"))
        .filter(col("stage").isNotNull)
      val u = funnelTimes(ev, n, windowNs).agg(
        count(col("t1")).as("u1"),
        (2 to n).map(k => count(col(s"t$k")).as(s"u$k")): _*)
      val stageRows = array((1 to n).map { k =>
        struct(lit(k.toLong).as("stage"), lit(stageTypes(k - 1)).as("stage_name"),
          col(s"u$k").as("users"), col(s"u${math.max(k - 1, 1)}").as("prev"))
      }: _*)
      u.select(explode(stageRows).as("s"), col("u1"))
        // an empty funnel (no stage-1 user at all) emits no rows rather
        // than engine-divergent 0/0 ratios; the oracle guards identically
        .filter(col("u1") > 0)
        .select(
          col("s.stage").as("stage"), col("s.stage_name").as("stage_name"),
          col("s.users").as("users"),
          floor(col("s.users") * lit(10000L) / col("u1")).as("conv_total_bp"),
          when(col("s.prev") > 0,
            floor(col("s.users") * lit(10000L) / col("s.prev")))
            .as("conv_step_bp"))
        .orderBy("stage")
    }

    def oracle: Option[String] = {
      val ctes = (1 to n).map { k =>
        if (k == 1)
          s"""s1 AS (SELECT user_id, min(tsn) AS t1 FROM ev
                WHERE event_type = '${stageTypes.head}' GROUP BY 1)"""
        else {
          val joins =
            if (k == 2) "JOIN s1 USING (user_id)"
            else s"JOIN s${k - 1} USING (user_id) JOIN s1 ON ev.user_id = s1.user_id"
          s"""s$k AS (SELECT ev.user_id, min(tsn) AS t$k FROM ev $joins
                WHERE event_type = '${stageTypes(k - 1)}'
                  AND tsn > s${k - 1}.t${k - 1}
                  AND tsn <= s1.t1 + $windowNs GROUP BY 1)"""
        }
      }
      val uCols = (1 to n)
        .map(k => s"(SELECT count(*) FROM s$k) AS u$k").mkString(", ")
      val unions = (1 to n).map { k =>
        val first = k == 1
        val prev = s"u${math.max(k - 1, 1)}"
        if (first) s"SELECT 1 AS stage, '${stageTypes.head}' AS stage_name, u1 AS users, u1 AS prev, u1 FROM u"
        else s"SELECT $k, '${stageTypes(k - 1)}', u$k, $prev, u1 FROM u"
      }.mkString("\n        UNION ALL\n        ")
      Some(s"""
      WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events),
      ${ctes.mkString(",\n      ")},
      u AS (SELECT $uCols)
      SELECT CAST(stage AS BIGINT) AS stage, stage_name,
             CAST(users AS BIGINT) AS users,
             CAST(floor(users * 10000.0 / u1) AS BIGINT) AS conv_total_bp,
             CASE WHEN prev > 0
                  THEN CAST(floor(users * 10000.0 / prev) AS BIGINT)
             END AS conv_step_bp
      FROM (
        $unions)
      WHERE u1 > 0
      ORDER BY stage
      """)
    }
  }

  /** view → click → purchase conversion funnel, 72 h completion window
    * (the flagship instance; `streaming.StatefulOps.funnelProgress` is
    * its live twin).
    */
  val funnelConversion: GraftQuery =
    funnelQuery("funnel_conversion", Seq("view", "click", "purchase"),
      FunnelWindowNs)

  /** 4-stage activation funnel (signup entry, 7-day window) — the second
    * instance proving the stage list and window are genuinely parameters.
    */
  val funnelActivation: GraftQuery =
    funnelQuery("funnel_activation", Seq("signup", "view", "click", "purchase"),
      7L * 24 * 3600 * 1000 * 1000 * 1000)

  /** Weekly cohort retention matrix: cohort = ISO week of the user's first
    * event; a user counts in cell (cohort, k) when active in cohort+k.
    */
  val cohortRetention: GraftQuery = new GraftQuery {
    val name = "cohort_retention"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // ONE scan and ONE user_id shuffle produce both the cohort label and
      // the user's distinct activity weeks (collect_set is bounded by the
      // calendar, not the event count); exploding the set yields unique
      // (user, week) pairs, so the cell count needs no distinct machinery.
      // The cohort size is the cell matrix's own offset-0 row, read back
      // with a window over the tiny (|weeks|²-row) frame — a self-join
      // here would recompute the whole aggregation subtree (Catalyst
      // cannot reuse the exchange once the offset-0 filter is pushed
      // through one copy).
      val perUser = Tables.load(spark, sfDir, "events")
        .select(col("user_id"), col("ts_ns"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .groupBy(col("user_id"))
        .agg(min(col("ts_ns")).as("first_tsn"),
          collect_set(col("week")).as("weeks"))
        .withColumn("cohort_week",
          date_trunc("week",
            timestamp_micros(expr("first_tsn div 1000"))).cast("date"))
        .select(col("user_id"), col("cohort_week"),
          explode(col("weeks")).as("week"))
      // exact mode counts the already-unique (user, week) pairs; the
      // approx lever swaps in a true distinct-user HLL, since at 100 TB
      // the per-cell count is the one aggregate left that scales with
      // users rather than the calendar
      val cellCounter =
        if (AggMode.approxDistinct(spark)) approx_count_distinct(col("user_id"))
        else count(lit(1))
      val cells = perUser
        .withColumn("offset_w",
          (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
        .groupBy(col("cohort_week"), col("offset_w"))
        .agg(cellCounter.as("active_users"))
      cohortFinal(cells)
    }

    def oracle: Option[String] = Some("""
      WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn,
                         CAST(date_trunc('week', ts) AS DATE) AS week
                  FROM events),
      cohorts AS (SELECT user_id,
                         CAST(date_trunc('week',
                           make_timestamp(min(tsn) // 1000)) AS DATE)
                           AS cohort_week
                  FROM ev GROUP BY 1),
      cells AS (SELECT cohort_week,
                       date_diff('day', cohort_week, week) // 7 AS offset_w,
                       count(DISTINCT a.user_id) AS active_users
                FROM (SELECT DISTINCT user_id, week FROM ev) a
                JOIN cohorts USING (user_id)
                GROUP BY 1, 2),
      sizes AS (SELECT cohort_week, active_users AS cohort_size
                FROM cells WHERE offset_w = 0)
      SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
             CAST(offset_w AS BIGINT) AS offset_w,
             CAST(active_users AS BIGINT) AS active_users,
             CAST(cohort_size AS BIGINT) AS cohort_size,
             CAST(floor(active_users * 10000.0 / cohort_size) AS BIGINT)
               AS retention_bp
      FROM cells JOIN sizes USING (cohort_week)
      ORDER BY cohort_week, offset_w
    """)
  }

  /** The matrix-shaping tail of [[cohortRetention]] from a (cohort_week
    * date, offset_w, active_users) cells frame — shared with the
    * streaming twin's spec, which derives the same cells from
    * `streaming.StatefulOps.cohortCells` emissions.
    */
  private[graft] def cohortFinal(cells: DataFrame): DataFrame = {
    val byCohort = Window.partitionBy(col("cohort_week"))
    cells
      .withColumn("cohort_size",
        max(when(col("offset_w") === 0, col("active_users"))).over(byCohort))
      .select(
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("offset_w"), col("active_users"), col("cohort_size"),
        floor(col("active_users") * lit(10000L) / col("cohort_size"))
          .as("retention_bp"))
      .orderBy("cohort_week", "offset_w")
  }

  /** Within-session transition counts from a (user_id, event_id, tsn,
    * event_type) frame: consecutive pairs under (tsn, event_id) order with
    * gap ≤ 30 min, with floor-bp row probabilities per source type.
    * Exposed for the spec's gap-edge fixture.
    */
  /** Consecutive (src, dst) value pairs of column `node` per user under
    * (tsn, event_id) order within the [[GapNs]] session gap — the ONE
    * sessionized-pair rule, shared by the transition grid (nodes =
    * event types) and [[Graph.pageEdges]] (nodes = pages): a change to
    * the gap/tie-break semantics must hit both or neither.
    */
  private[graft] def sessionPairs(ev: DataFrame, node: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsn"), col("event_id"))
    ev.withColumn("dst", lead(col(node), 1).over(w))
      .withColumn("gap_ns", lead(col("tsn"), 1).over(w) - col("tsn"))
      .filter(col("dst").isNotNull && col("gap_ns") <= GapNs)
      .select(col(node).as("src"), col("dst"))
  }

  private[graft] def transitionGrid(ev: DataFrame): DataFrame = {
    val pairs = sessionPairs(ev, "event_type")
    val grid = pairs.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val tw = Window.partitionBy(col("src"))
    grid
      .withColumn("src_total", sum(col("n")).over(tw))
      .select(col("src"), col("dst"), col("n"),
        floor(col("n") * lit(10000L) / col("src_total")).as("prob_bp"))
  }

  /** Event-type Markov transition matrix within 30-min sessions. */
  val eventTransitions: GraftQuery = new GraftQuery {
    val name = "event_transitions"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      transitionGrid(
        Tables.load(spark, sfDir, "events")
          .select(col("user_id"), col("event_id"), col("ts_ns").as("tsn"),
            col("event_type")))
        .orderBy("src", "dst")

    def oracle: Option[String] = Some(s"""
      WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, event_type
                  FROM events),
      pairs AS (SELECT event_type AS src,
                       lead(event_type) OVER w AS dst,
                       lead(tsn) OVER w - tsn AS gap_ns
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      grid AS (SELECT src, dst, count(*) AS n FROM pairs
               WHERE dst IS NOT NULL AND gap_ns <= $GapNs GROUP BY 1, 2)
      SELECT src, dst, CAST(n AS BIGINT) AS n,
             CAST(floor(n * 10000.0 / sum(n) OVER (PARTITION BY src))
               AS BIGINT) AS prob_bp
      FROM grid ORDER BY src, dst
    """)
  }

  /** Rolling actives from a distinct (day, user_id) frame: each activity
    * day contributes the user to the 7 window-end days d..d+6. ONE
    * aggregation computes both counters — DAU is the k=0 slice of the
    * same exploded frame, and `dau_ct > 0` IS the "window-end day exists
    * in the data" test (a day with zero k=0 rows is not a data day), so
    * there is no day-grid join, no second aggregation, and the distinct
    * frame is consumed exactly once. Both counters honor the
    * approx-distinct scale lever (the fan-out re-introduces per-window
    * duplicates, so they are true distincts HLL can stand in for; an
    * HLL dau estimate over a nonempty day is always ≥ 1, so the
    * day-exists filter survives the lever flip).
    */
  private[graft] def rollingActive(du: DataFrame): DataFrame = {
    val spark = du.sparkSession
    du
      .withColumn("k", explode(sequence(lit(0), lit(6))))
      .withColumn("day", date_add(col("day"), col("k")))
      .groupBy(col("day"))
      .agg(
        AggMode.distinctCount(spark, col("user_id")).as("wau_ct"),
        AggMode.distinctCount(spark,
          when(col("k") === 0, col("user_id"))).as("dau_ct"))
      .filter(col("dau_ct") > 0)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau_ct"), col("wau_ct"))
  }

  /** Daily and trailing-7-day distinct active users (DAU / WAU). */
  val rollingActives: GraftQuery = new GraftQuery {
    val name = "rolling_actives"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      rollingActive(
        Tables.load(spark, sfDir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct())
        .orderBy("day")

    def oracle: Option[String] = Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      days AS (SELECT DISTINCT d FROM du),
      wau AS (SELECT days.d, count(DISTINCT du.user_id) AS wau_ct
              FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
              GROUP BY 1),
      dau AS (SELECT d, count(DISTINCT user_id) AS dau_ct FROM du GROUP BY 1)
      SELECT strftime(wau.d, '%Y-%m-%d') AS day, dau_ct, wau_ct
      FROM wau JOIN dau ON wau.d = dau.d ORDER BY day
    """)
  }

  /** Maximum events contributing to a session's path string. A whale
    * session (the 10x fixture's hot user runs 200k-event sessions) would
    * otherwise produce megabyte path strings nobody reads — the cap keeps
    * the assembled value bounded at any scale while leaving real
    * people-length sessions untouched.
    */
  private[graft] val PathCap = 24

  /** Top session paths: sessions split at the 30-min gap (the same
    * gaps-and-islands counter `session_stats` uses), each session's
    * ordered event-type sequence (first [[PathCap]] events) joined into a
    * path string, counted and ranked. Scale shape: one user_id window
    * shuffle to stamp session ids, one narrow (user, session) shuffle to
    * assemble paths (value bounded by the cap), then the path grid — the
    * heavy frames never carry more than a session's events per key. The
    * final top-20 is a TakeOrdered over the path grid, not a global sort.
    */
  /** Per-session capped path strings from a (user_id, event_id, tsn,
    * event_type) frame — the grid [[sessionPaths]] ranks. Exposed for the
    * spec's whale-session cap fixture.
    */
  private[graft] def sessionPathGrid(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsn"), col("event_id"))
    ev
      .withColumn("new_sess",
          when(col("tsn") - lag(col("tsn"), 1).over(w) > GapNs ||
            lag(col("tsn"), 1).over(w).isNull, lit(1)).otherwise(lit(0)))
        .withColumn("rn", row_number().over(w))
        .withColumn("sess", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("sess_start", max(when(col("new_sess") === 1, col("rn"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // drop beyond-cap rows BEFORE the path-assembly shuffle — the
        // whale session contributes PathCap rows downstream, not 200k
        .filter(col("rn") - col("sess_start") < PathCap)
        .groupBy(col("user_id"), col("sess"))
        .agg(sort_array(collect_list(
          struct(col("tsn"), col("event_id"), col("event_type")))).as("evs"))
        .select(array_join(
          transform(col("evs"), x => x("event_type")), "->").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
  }

  val sessionPaths: GraftQuery = new GraftQuery {
    val name = "session_paths"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      sessionPathGrid(
        Tables.load(spark, sfDir, "events")
          .select(col("user_id"), col("event_id"), col("ts_ns").as("tsn"),
            col("event_type")))
        .orderBy(col("n").desc, col("path"))
        .limit(20)

    def oracle: Option[String] = Some(s"""
      WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, event_type
                  FROM events),
      x AS (SELECT *, CASE WHEN lag(tsn) OVER w IS NULL
                             OR tsn - lag(tsn) OVER w > $GapNs
                           THEN 1 ELSE 0 END AS new_sess,
                      row_number() OVER w AS rn
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
      s AS (SELECT *, sum(new_sess) OVER wc AS sess,
                      max(CASE WHEN new_sess = 1 THEN rn END) OVER wc
                        AS sess_start
            FROM x WINDOW wc AS (PARTITION BY user_id
              ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING)),
      p AS (SELECT user_id, sess,
                   string_agg(event_type, '->' ORDER BY tsn, event_id) AS path
            FROM s WHERE rn - sess_start < $PathCap GROUP BY 1, 2)
      SELECT path, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """)
  }

  /** The weekly rollup tail of [[weeklyChurn]] from a per-(user, week)
    * flags frame (week date, is_new, is_churned) — shared with the
    * streaming twin's spec (`streaming.StatefulOps.weeklyChurnFlags`
    * emits exactly these flags).
    */
  private[graft] def churnFinal(flags: DataFrame): DataFrame =
    flags
      .groupBy(col("week"))
      .agg(count(lit(1)).as("active_users"),
        sum(col("is_new")).as("new_users"),
        sum(col("is_churned")).as("churned_users"))
      .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("active_users"), col("new_users"), col("churned_users"))
      .orderBy("week")

  /** Weekly active/new/churned flow: a user is NEW in week w when not
    * active in w−1, and CHURNED from w when not active in w+1 (data-end
    * weeks churn by definition — there is no later activity). Computed
    * with lag/lead over each user's ordered distinct-week sequence — one
    * user_id shuffle over the distinct (user, week) frame, then the
    * per-week grid; no week-shifted self-join of the activity table.
    */
  val weeklyChurn: GraftQuery = new GraftQuery {
    val name = "weekly_churn"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
      churnFinal(
        Tables.load(spark, sfDir, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("week"))
          .distinct()
          .withColumn("prev_w", lag(col("week"), 1).over(w))
          .withColumn("next_w", lead(col("week"), 1).over(w))
          .withColumn("is_new",
            when(col("prev_w").isNull ||
              col("prev_w") =!= date_sub(col("week"), 7), 1L).otherwise(0L))
          .withColumn("is_churned",
            when(col("next_w").isNull ||
              col("next_w") =!= date_add(col("week"), 7), 1L).otherwise(0L)))
    }

    def oracle: Option[String] = Some("""
      WITH wu AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('week', ts) AS DATE) AS week
                  FROM events),
      x AS (SELECT *, lag(week) OVER w AS prev_w, lead(week) OVER w AS next_w
            FROM wu WINDOW w AS (PARTITION BY user_id ORDER BY week))
      SELECT strftime(week, '%Y-%m-%d') AS week,
             count(*) AS active_users,
             CAST(sum(CASE WHEN prev_w IS NULL OR prev_w <> week - 7
                           THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             CAST(sum(CASE WHEN next_w IS NULL OR next_w <> week + 7
                           THEN 1 ELSE 0 END) AS BIGINT) AS churned_users
      FROM x GROUP BY 1 ORDER BY week
    """)
  }

  /** Schema'd JSON extraction from the props payload — the
    * semi-structured surface every log warehouse needs. `from_json` with
    * an explicit schema keeps the parse inside whole-stage codegen (one
    * map-only pass; a schema-less parse would pay inference or string
    * probing per row), then plain per-type aggregates over the extracted
    * field prove it composes.
    */
  val propsStats: GraftQuery = new GraftQuery {
    val name = "props_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "events")
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType))))("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("parsed_ct"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"),
          countDistinct(col("k")).as("k_distinct"))
        .orderBy("event_type")

    def oracle: Option[String] = Some("""
      -- TRY_CAST mirrors Spark from_json's PERMISSIVE null-on-malformed:
      -- both engines yield NULL for unparseable / non-integral k. The
      -- fixture's props is uniformly {"k": int}; on a messier payload the
      -- engines could still diverge on non-integral numerics (Spark nulls,
      -- DuckDB rounds) — uniform-integral payload is a stated assumption.
      WITH e AS (SELECT event_type,
                        TRY_CAST(json_extract(props, '$.k') AS BIGINT) AS k
                 FROM events)
      SELECT event_type,
             count(k) AS parsed_ct,
             CAST(sum(k) AS BIGINT) AS k_sum,
             CAST(min(k) AS BIGINT) AS k_min,
             CAST(max(k) AS BIGINT) AS k_max,
             count(DISTINCT k) AS k_distinct
      FROM e GROUP BY 1 ORDER BY event_type
    """)
  }

  val all: Seq[GraftQuery] =
    Seq(funnelConversion, funnelActivation, cohortRetention, eventTransitions,
      rollingActives, sessionPaths, weeklyChurn, propsStats)
}
