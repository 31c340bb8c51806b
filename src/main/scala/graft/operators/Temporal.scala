package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions.hash24
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal enrichment operators: as-of join and SCD2 dimension versioning.
  *
  * The reference joins facts to dims either keyed-latest (dim upsert,
  * `RT/app/function/DimSinkFunction.java:22-76`) or within a symmetric
  * interval (intervalJoin, `RT/app/dwm/OrderWideApp.java:84-104`). The
  * operator BOTH of those approximate is the as-of join: each fact matched
  * to the single most recent dimension version at or before the fact's
  * event time. Spark has no built-in as-of join; the scalable form is the
  * union-merge: tag both sides, union, ONE shuffle on the key, and a
  * running `last(ignoreNulls)` window carries the latest version forward
  * into each fact row. No range-join candidate explosion, no per-fact
  * probe: cost is one sort-merge pass per key regardless of fact:version
  * ratio — at 100 TB the shuffle is the same one any keyed join pays, and
  * the window is a single ordered scan within each key partition.
  *
  * The fixture instantiation is last-touch attribution inside the events
  * table: each `purchase` is attributed to the user's most recent
  * preceding `view`/`click` touchpoint. The DuckDB oracle runs its native
  * ASOF JOIN — a genuinely independent implementation of the semantics
  * (plane-sweep in DuckDB vs union-merge window here), so a hash match is
  * strong evidence the operator is right, including the >=-matches-equal
  * tie rule.
  *
  * All time comparisons run on BIGINT epoch microseconds (`unix_micros` /
  * `epoch_us`) — events.ts is parquet TIMESTAMP(NANOS), and the two
  * engines must dedupe and compare at the SAME truncation or a
  * nanosecond-apart pair of touches could dedupe differently.
  */
object Temporal {

  /** One-hour attribution window for the tolerance variant, in micros. */
  private[graft] val ToleranceUs = 3600000000L

  /** Raw touch-point stream (no dedupe): the as-of path does not need
    * one — the running `last()` in [[asofMatch]], ordered by (tsu, side,
    * event_id), already resolves a same-microsecond tie to the max
    * event_id touch, which is exactly the dedupe rule the oracle applies
    * before its ASOF join. Feeding raw rows deletes a full shuffle+sort
    * of the touch side from the attribution queries.
    */
  private[graft] def rawTouchPoints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("props").as("touch_props"))

  /** Deduped touch-point versions: at most one `view`/`click` row per
    * (user, microsecond) — keep max event_id, mirroring the oracle — for
    * the SCD2 interval build, where a duplicate timestamp would produce a
    * zero-width version. The dedupe is a lag-compare partitioned by
    * user_id ALONE (first row of each tsu group under an event_id-desc
    * sort), so the downstream `lead` window reuses the same exchange and
    * sort instead of paying a second (user, tsu) shuffle.
    */
  private[graft] def touchPoints(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("touch_id").desc)
    rawTouchPoints(spark, sfDir)
      .withColumn("prev_tsu", lag(col("tsu"), 1).over(w))
      .filter(col("prev_tsu").isNull || col("prev_tsu") =!= col("tsu"))
      .select(col("user_id"), col("tsu"), col("touch_type"), col("touch_props"))
  }

  /** Purchase facts with epoch-micro event time. */
  private[graft] def purchases(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("event_id"), col("value"))

  /** The union-merge as-of join: every fact row gains the latest
    * version-side columns with version time <= fact time (equal times
    * match, like DuckDB ASOF `>=`). Expects `versions(user_id, tsu,
    * touch_type, touch_props)` and `facts(user_id, tsu, event_id, value)`;
    * returns one row per fact with `m_type/m_props/m_tsu` (null when no
    * version precedes) and `gap_us`.
    *
    * Versions sort BEFORE facts at an equal timestamp (side 0 < 1), which
    * is exactly the >=-inclusive rule; `ord` (event_id on both sides —
    * `touch_id` when the version frame carries one) totalizes the order
    * so the window never evaluates over tied peers, and same-timestamp
    * duplicate versions resolve to the max id, the oracle's dedupe rule.
    */
  private[graft] def asofMatch(versions: DataFrame, facts: DataFrame): DataFrame = {
    val vOrd =
      if (versions.columns.contains("touch_id")) col("touch_id").cast("long")
      else lit(0L)
    val v = versions.select(
      col("user_id"), col("tsu"), lit(0).as("side"), vOrd.as("ord"),
      col("touch_type"), col("touch_props"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val f = facts.select(
      col("user_id"), col("tsu"), lit(1).as("side"), col("event_id").as("ord"),
      lit(null).cast("string").as("touch_type"),
      lit(null).cast("string").as("touch_props"),
      col("event_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("side"), col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.unionByName(f)
      .withColumn("m_type", last(col("touch_type"), ignoreNulls = true).over(w))
      .withColumn("m_props", last(col("touch_props"), ignoreNulls = true).over(w))
      .withColumn("m_tsu",
        last(when(col("side") === 0, col("tsu")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("gap_us", col("tsu") - col("m_tsu"))
      .select("user_id", "tsu", "event_id", "value",
        "m_type", "m_props", "m_tsu", "gap_us")
  }

  /** Shared oracle prologue: deduped touches + purchases + the ASOF match. */
  private val duckAsofCtes = """
      WITH t0 AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_type, props,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('view', 'click')),
      touches AS (
        SELECT user_id, tsu, event_type AS m_type, props AS m_props
        FROM t0 WHERE rn = 1),
      p AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id, value
        FROM events WHERE event_type = 'purchase'),
      m AS (
        SELECT p.user_id, p.tsu, p.event_id, p.value,
               t.m_type, t.m_props, t.tsu AS m_tsu,
               p.tsu - t.tsu AS gap_us
        FROM p ASOF LEFT JOIN touches t
          ON p.user_id = t.user_id AND p.tsu >= t.tsu)"""

  /** As-of last-touch attribution: purchases grouped by the touch type the
    * as-of join assigned them (`none` when the purchase precedes every
    * touch). The id checksum pins the exact per-row assignment — any
    * fact matched to a different version changes `id_sum`, not just the
    * counts.
    */
  val asofAttribution: GraftQuery = new GraftQuery {
    val name = "asof_attribution"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      asofMatch(rawTouchPoints(spark, sfDir), purchases(spark, sfDir))
        .groupBy(coalesce(col("m_type"), lit("none")).as("touch_type"))
        .agg(
          count(lit(1)).as("purchase_ct"),
          countDistinct(col("user_id")).as("user_ct"),
          Money.sumCents(col("value")).as("value_cents"),
          coalesce(sum(col("gap_us")), lit(0L)).cast("long").as("gap_us_sum"),
          sum(col("event_id")).cast("long").as("id_sum"))
        .orderBy("touch_type")

    def oracle: Option[String] = Some(s"""
      $duckAsofCtes
      SELECT coalesce(m_type, 'none') AS touch_type,
             count(*) AS purchase_ct,
             count(DISTINCT user_id) AS user_ct,
             ${Money.sumCentsSql("value")} AS value_cents,
             CAST(coalesce(sum(gap_us), 0) AS BIGINT) AS gap_us_sum,
             CAST(sum(event_id) AS BIGINT) AS id_sum
      FROM m GROUP BY 1 ORDER BY touch_type
    """)
  }

  /** As-of with a lookback tolerance: a touch older than 1 hour does not
    * get the credit. Because the as-of match is the MOST RECENT preceding
    * version, "most recent within the window" is a post-filter on the
    * matched gap — no second join. (DuckDB ASOF cannot express the bound
    * directly; its oracle applies the identical CASE over the plain ASOF
    * result.) `expired_ct` counts the attributions the bound voided —
    * all land in the `none` group by construction.
    */
  val asofTolerance: GraftQuery = new GraftQuery {
    val name = "asof_tolerance"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      asofMatch(rawTouchPoints(spark, sfDir), purchases(spark, sfDir))
        .withColumn("eff_type",
          when(col("gap_us") <= ToleranceUs, col("m_type")))
        .groupBy(coalesce(col("eff_type"), lit("none")).as("touch_type"))
        .agg(
          count(lit(1)).as("purchase_ct"),
          countDistinct(col("user_id")).as("user_ct"),
          Money.sumCents(col("value")).as("value_cents"),
          sum(when(col("m_type").isNotNull && col("gap_us") > ToleranceUs, 1)
            .otherwise(0)).cast("long").as("expired_ct"))
        .orderBy("touch_type")

    def oracle: Option[String] = Some(s"""
      $duckAsofCtes
      SELECT coalesce(CASE WHEN gap_us <= $ToleranceUs THEN m_type END,
                      'none') AS touch_type,
             count(*) AS purchase_ct,
             count(DISTINCT user_id) AS user_ct,
             ${Money.sumCentsSql("value")} AS value_cents,
             CAST(sum(CASE WHEN m_type IS NOT NULL AND gap_us > $ToleranceUs
                           THEN 1 ELSE 0 END) AS BIGINT) AS expired_ct
      FROM m GROUP BY 1 ORDER BY touch_type
    """)
  }

  /** SCD2 version intervals from the touch stream: each touch opens a
    * version valid [its time, next touch's time) per user, the last one
    * open-ended — `lead` over a per-user sort whose key is unique after
    * the dedupe, so both engines see a total order. This is the interval
    * form of the reference's keep-latest dim upsert: instead of
    * overwriting, history is retained and facts can join the version that
    * was current AT THEIR TIME.
    */
  private[graft] def scd2Versions(spark: SparkSession, sfDir: String): DataFrame =
    touchPoints(spark, sfDir)
      .withColumn("valid_to_us", lead(col("tsu"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("tsu"))))
      .withColumnRenamed("tsu", "valid_from_us")

  /** Per-user SCD2 history audit: version count, covered duration, and a
    * hash checksum over every (user, from, type, to) tuple — the checksum
    * IS the interval-set proof: any misplaced boundary on either engine
    * shifts it.
    */
  val scd2History: GraftQuery = new GraftQuery {
    val name = "scd2_history"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      scd2Versions(spark, sfDir)
        .withColumn("vh", hash24(concat_ws(":",
          col("user_id"), col("valid_from_us"), col("touch_type"),
          coalesce(col("valid_to_us"), lit(-1L)))))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("version_ct"),
          coalesce(sum(col("valid_to_us") - col("valid_from_us")), lit(0L))
            .cast("long").as("covered_us"),
          sum(col("vh")).cast("long").as("interval_hash_sum"))
        .orderBy("user_id")

    def oracle: Option[String] = {
      import graft.functions.TextFunctions.duckHashHex
      val tuple = "CAST(user_id AS VARCHAR) || ':' || CAST(valid_from_us AS VARCHAR)" +
        " || ':' || touch_type || ':' || CAST(coalesce(valid_to_us, -1) AS VARCHAR)"
      Some(s"""
      WITH t0 AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_type, props,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('view', 'click')),
      v AS (
        SELECT user_id, tsu AS valid_from_us, event_type AS touch_type,
               lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS valid_to_us
        FROM t0 WHERE rn = 1)
      SELECT user_id,
             count(*) AS version_ct,
             CAST(coalesce(sum(valid_to_us - valid_from_us), 0) AS BIGINT)
               AS covered_us,
             CAST(sum(${duckHashHex(tuple, 6)}) AS BIGINT) AS interval_hash_sum
      FROM v GROUP BY 1 ORDER BY user_id
      """)
    }
  }

  /** Per-user chunk width clamp bounds (micros): ~4.2 s .. ~1.6 days. */
  private[graft] val MinChunkUs = 1L << 22
  private[graft] val MaxChunkUs = 1L << 37

  /** The interval join, bucketed for skew: joining facts to versions on
    * user_id alone is quadratic in any hot user's row count (the 10x
    * blowup's planted 20%-hot user drove the naive form to 14 s while
    * every other temporal query stayed ~1 s — ~80k versions x 40k facts
    * meeting under ONE key). Instead both sides co-key on (user_id,
    * time-chunk): a fact lives in exactly one chunk, a version is
    * exploded into just the chunks its validity overlaps, so the
    * covering version is ALWAYS in the fact's chunk and every hot key is
    * spread over the time axis — the range-join bucketing a warehouse
    * range-join hint performs.
    *
    * The chunk width is PER USER, not a global knob: a power of two near
    * 4x the user's mean closed-interval length (clamped). A dense (hot)
    * user gets fine chunks — few versions meet few facts per key — while
    * a sparse user gets coarse ones, so the tiling explode stays ~O(1)
    * copies per version for EVERY key-density profile at once; a global
    * width must sacrifice one end (1 h on the 10x fixture: 10.1M tiled
    * rows from the 31 h-gap sparse users; 1 day: ~100M hot-user pairs).
    * Both join sides read the width from the same per-user frame, so the
    * keys agree by construction, and result rows are width-invariant
    * (TemporalSpec proves equality with the naive join and the as-of).
    * Returns one row per fact (left semantics), matched version columns
    * null when no version covers it.
    */
  private[graft] def intervalJoin(versions: DataFrame, facts: DataFrame): DataFrame = {
    val closedV = versions.filter(col("valid_to_us").isNotNull)
    // per-user width: the groupBy rides the user_id partitioning the
    // version build already has; the result is one row per user
    val widths = closedV.groupBy(col("user_id"))
      .agg(avg(col("valid_to_us") - col("valid_from_us")).as("mean_len"))
      .withColumn("cw", pow(lit(2.0), ceil(log(2.0,
          greatest(lit(MinChunkUs.toDouble),
            least(lit(MaxChunkUs.toDouble), col("mean_len") * 4)))))
        .cast("long"))
      .select(col("user_id"), col("cw"))
    // CLOSED versions: chunk-bucketed — the explode is bounded by each
    // interval's real length in ITS USER'S chunks. Columns are renamed
    // (v_/o_ prefixes) so both joins resolve by NAME: the widths frame
    // feeds both sides, and dataset-column references across shared
    // lineage trip the ambiguous-self-join check
    val vc = closedV.join(widths, "user_id")
      .withColumn("v_chunk", explode(sequence(
        expr("valid_from_us div cw"),
        expr("(valid_to_us - 1) div cw"))))
      .select(col("user_id").as("v_user_id"), col("v_chunk"),
        col("valid_from_us").as("v_valid_from_us"),
        col("valid_to_us").as("v_valid_to_us"),
        col("touch_type").as("v_touch_type"),
        col("touch_props").as("v_touch_props"))
    // per-user width lookup: one row per user on the build side, so even
    // the hot user costs a linear probe (AQE picks broadcast vs shuffle
    // from the real user count)
    val fc = facts.join(widths, Seq("user_id"), "left")
      .withColumn("chunk", expr("tsu div cw"))
      .drop("cw")
    // the explode multiplies vc AFTER the size estimate Catalyst
    // broadcasts on — without the hint AQE shipped a ~10M-row broadcast
    // hash relation to every task (measured 13.5 s on the 10x blowup vs
    // 1.9 s as a shuffled hash join on the fine (user, chunk) key)
    val closed = fc.join(vc.hint("shuffle_hash"),
        col("user_id") === col("v_user_id") && col("chunk") === col("v_chunk") &&
          col("tsu") >= col("v_valid_from_us") && col("tsu") < col("v_valid_to_us"),
        "left")
    // OPEN version (exactly one per user): a plain equi join — the build
    // side is one row per user, so even a pathologically hot user costs a
    // linear probe, and no explode-to-corpus-end is ever paid
    val vo = versions.filter(col("valid_to_us").isNull)
      .select(col("user_id").as("o_user_id"),
        col("valid_from_us").as("o_valid_from_us"),
        col("touch_type").as("o_touch_type"),
        col("touch_props").as("o_touch_props"))
    // intervals partition each user's timeline, so every fact matches the
    // closed pass xor the open pass xor neither; coalesce merges them
    closed.join(vo,
        col("user_id") === col("o_user_id") &&
          col("tsu") >= col("o_valid_from_us"),
        "left")
      .withColumn("m_valid_from_us",
        coalesce(col("v_valid_from_us"), col("o_valid_from_us")))
      .withColumn("m_touch_type",
        coalesce(col("v_touch_type"), col("o_touch_type")))
      .withColumn("m_touch_props",
        coalesce(col("v_touch_props"), col("o_touch_props")))
  }

  /** Fact enrichment THROUGH the SCD2 intervals: purchases left-joined to
    * the version current at their time (the bucketed interval-join plan
    * shape of [[intervalJoin]], vs [[asofAttribution]]'s union-merge;
    * TemporalSpec proves naive interval join, bucketed interval join and
    * as-of all assign identical versions). Grouped by the version's
    * props channel: the 100-value dimension attribution the touch-type
    * rollup is too coarse to check.
    */
  val scd2Enrich: GraftQuery = new GraftQuery {
    val name = "scd2_enrich"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // three consumers (widths, closed, open) would each replay the
      // dedupe+lead window pipeline from the scan; the frame is ~1 row
      // per touch — cache it once
      val v = graft.CacheRegistry.persist(scd2Versions(spark, sfDir))
      val p = purchases(spark, sfDir)
      intervalJoin(v, p)
        .groupBy(coalesce(col("m_touch_props"), lit("none")).as("channel"))
        .agg(
          count(lit(1)).as("purchase_ct"),
          countDistinct(col("user_id")).as("user_ct"),
          Money.sumCents(col("value")).as("value_cents"),
          sum(col("event_id")).cast("long").as("id_sum"))
        .orderBy("channel")
    }

    def oracle: Option[String] = Some("""
      WITH t0 AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_type, props,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('view', 'click')),
      v AS (
        SELECT user_id, tsu AS valid_from_us, props,
               lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS valid_to_us
        FROM t0 WHERE rn = 1),
      p AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id, value
        FROM events WHERE event_type = 'purchase')
      SELECT coalesce(v.props, 'none') AS channel,
             count(*) AS purchase_ct,
             count(DISTINCT p.user_id) AS user_ct,
             CAST(sum(CAST(p.value AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS value_cents,
             CAST(sum(p.event_id) AS BIGINT) AS id_sum
      FROM p LEFT JOIN v
        ON p.user_id = v.user_id
       AND p.tsu >= v.valid_from_us
       AND (v.valid_to_us IS NULL OR p.tsu < v.valid_to_us)
      GROUP BY 1 ORDER BY channel
    """)
  }

  /** Multi-touch LINEAR attribution: every touch in the hour before a
    * purchase shares its credit — the many-to-many bounded-window range
    * join, vs the as-of's most-recent-one and the SCD2 intervals'
    * exactly-one. Credit is integer basis points (10000 per purchase:
    * each touch gets 10000 div n, the LAST touch absorbs the remainder),
    * so the split is exact cross-engine and the invariant "total credit
    * = 10000 x purchases" holds to the point (`none` rows carry
    * unattributed purchases' full credit).
    *
    * Scale shape: because the window is BOUNDED, the join bands on
    * (user_id, window-chunk) with chunk width = the window itself — each
    * purchase probes exactly two chunks (its own and the previous), each
    * touch lives in one, so pair count is window density, never a hot
    * user's full history squared.
    */
  /** The banded in-window pair build shared by the batch attribution
    * queries and the streaming twin: `touches(user_id, tsu, touch_id,
    * touch_type)` x `facts(user_id, tsu, event_id, value)` on
    * (user, window-chunk).
    */
  private[graft] def windowPairs(touches: DataFrame, facts: DataFrame): DataFrame = {
    val W = ToleranceUs
    val t = touches
      .select(col("user_id").as("t_user_id"), col("tsu").as("t_tsu"),
        col("touch_id"), col("touch_type"))
      .withColumn("t_chunk", expr(s"t_tsu div $W"))
    val pc = facts.withColumn("chunk",
      explode(array(expr(s"tsu div $W - 1"), expr(s"tsu div $W"))))
    pc.join(t,
      col("user_id") === col("t_user_id") && col("chunk") === col("t_chunk") &&
        col("t_tsu") <= col("tsu") && col("t_tsu") >= col("tsu") - W)
  }

  /** Linear credit split over [[windowPairs]] output, per touch type with
    * the `none` row carrying unattributed facts — the unit both the
    * oracled batch query and each stream micro-batch run.
    *
    * Pure-aggregation form: a per-pair rank window measured ~2.3x slower
    * at 10x and an anti-join pass for the unmatched rows repaid the
    * whole banded join — per (purchase, type) counts with the struct-max
    * identifying the LAST touch, one roll-up to per-purchase totals,
    * credit arithmetic on the joined pair, and the unattributed count as
    * the gap between two 1-row aggregates.
    */
  private[graft] def linearSplit(pairs: DataFrame, facts: DataFrame,
      stage: DataFrame => DataFrame = identity): DataFrame = {
    // `stage` is the per-(purchase, type) staging hook: byType feeds BOTH
    // the per-event rollup and the credit join, and un-staged the whole
    // banded-join subtree (two events scans) recomputes per consumer —
    // plan-audited at 7 events scans for the batch query, 3 after its
    // CacheRegistry.persist hook. The streaming twin passes identity (a
    // per-micro-batch persist would outlive the batch in the registry);
    // its micro-batch frames are small enough that the recompute is the
    // cheaper side of the trade.
    val byType = stage(pairs.groupBy(col("event_id"), col("touch_type"))
      .agg(count(lit(1)).as("ct"),
        max(struct(col("t_tsu"), col("touch_id"))).as("mx")))
    val perEvent = byType.groupBy(col("event_id"))
      .agg(sum(col("ct")).as("n"), max(col("mx")).as("mxall"))
    val credited = byType.join(perEvent, "event_id")
      .select(col("touch_type"), col("ct"),
        (col("ct") * expr("10000 div n") +
          when(col("mx") === col("mxall"),
            lit(10000L) - col("n") * expr("10000 div n"))
            .otherwise(lit(0L))).as("bp_sum"))
    val none = facts.agg(count(lit(1)).as("total_ct"))
      .crossJoin(perEvent.agg(count(lit(1)).as("matched_ct")))
      .select(lit("none").as("touch_type"),
        (col("total_ct") - col("matched_ct")).as("ct"),
        ((col("total_ct") - col("matched_ct")) * 10000L).as("bp_sum"))
    credited.unionByName(none)
      .groupBy(col("touch_type"))
      .agg(sum(col("ct")).cast("long").as("credit_ct"),
        sum(col("bp_sum")).cast("long").as("credit_bp_sum"))
      .filter(col("credit_ct") > 0)
  }

  val attributionLinear: GraftQuery = new GraftQuery {
    val name = "attribution_linear"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val p = purchases(spark, sfDir)
      linearSplit(windowPairs(rawTouchPoints(spark, sfDir), p), p,
        graft.CacheRegistry.persist)
        .orderBy("touch_type")
    }

    def oracle: Option[String] = Some(s"""
      WITH t AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id AS touch_id,
               event_type AS touch_type
        FROM events WHERE event_type IN ('view', 'click')),
      p AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id, value
        FROM events WHERE event_type = 'purchase'),
      pairs AS (
        SELECT p.event_id, t.tsu AS ttsu, t.touch_id, t.touch_type
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.tsu <= p.tsu AND t.tsu >= p.tsu - $ToleranceUs),
      n AS (
        SELECT *, count(*) OVER (PARTITION BY event_id) AS n,
               row_number() OVER (PARTITION BY event_id
                                  ORDER BY ttsu DESC, touch_id DESC) AS rn
        FROM pairs),
      c AS (
        SELECT touch_type,
               CASE WHEN rn = 1 THEN 10000 - (n - 1) * (10000 // n)
                    ELSE 10000 // n END AS bp
        FROM n),
      un AS (
        SELECT 'none' AS touch_type, 10000 AS bp FROM p
        WHERE NOT EXISTS (
          SELECT 1 FROM t WHERE t.user_id = p.user_id
           AND t.tsu <= p.tsu AND t.tsu >= p.tsu - $ToleranceUs)),
      allc AS (SELECT * FROM c UNION ALL SELECT * FROM un)
      SELECT touch_type, count(*) AS credit_ct,
             CAST(sum(bp) AS BIGINT) AS credit_bp_sum
      FROM allc GROUP BY 1 ORDER BY touch_type
    """)
  }

  /** Time-decay attribution — the third member of the standard trio
    * (last-touch = [[asofAttribution]], linear = [[attributionLinear]]):
    * a touch's weight halves every 15 minutes of age, and each
    * purchase's 10000 bp are split per touch TYPE proportionally to the
    * type's summed weight, the division remainder going to the type
    * holding the most recent touch. Everything stays integer-exact
    * cross-engine: weights are dyadic (2^(13-bucket), bucket capped at
    * 13), shares are integer division — the reason credit is allocated
    * at type granularity (floor-of-sum ≠ sum-of-floors, so per-touch
    * floors would not be reconstructible from a type-level oracle).
    * Same banded join and pure-aggregation shape as the linear form.
    */
  val attributionDecay: GraftQuery = new GraftQuery {
    val name = "attribution_decay"

    /** 15-minute decay bucket, weights 2^(13-bucket) capped at 13. */
    private val DecayUs = 900000000L

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val W = ToleranceUs
      val t = rawTouchPoints(spark, sfDir)
        .select(col("user_id").as("t_user_id"), col("tsu").as("t_tsu"),
          col("touch_id"), col("touch_type"))
        .withColumn("t_chunk", expr(s"t_tsu div $W"))
      val p = purchases(spark, sfDir)
      val pc = p.withColumn("chunk",
        explode(array(expr(s"tsu div $W - 1"), expr(s"tsu div $W"))))
      val pairs = pc.join(t,
          col("user_id") === col("t_user_id") && col("chunk") === col("t_chunk") &&
            col("t_tsu") <= col("tsu") && col("t_tsu") >= col("tsu") - W)
        .withColumn("wgt", expr(
          s"cast(pow(2.0, 13 - least(13L, (tsu - t_tsu) div $DecayUs)) as bigint)"))
      // staged for the same reason as linearSplit's hook: byType feeds
      // the rollup AND the credit join, and the banded-join subtree
      // would recompute per consumer (plan-audited: 11 → 3 events scans)
      val byType = graft.CacheRegistry.persist(
        pairs.groupBy(col("event_id"), col("touch_type"))
          .agg(sum(col("wgt")).as("w_type"),
            max(struct(col("t_tsu"), col("touch_id"))).as("mx")))
      val perEvent = byType.groupBy(col("event_id"))
        .agg(sum(col("w_type")).as("w_all"), max(col("mx")).as("mxall"))
      val credited = byType.join(perEvent, "event_id")
        .withColumn("base", expr("(10000 * w_type) div w_all"))
      val rema = credited.groupBy(col("event_id"))
        .agg((lit(10000L) - sum(col("base"))).as("rem"))
      val bp = credited.join(rema, "event_id")
        .select(col("touch_type"),
          (col("base") + when(col("mx") === col("mxall"), col("rem"))
            .otherwise(lit(0L))).as("bp_sum"))
      val none = p.agg(count(lit(1)).as("total_ct"))
        .crossJoin(perEvent.agg(count(lit(1)).as("matched_ct")))
        .select(lit("none").as("touch_type"),
          ((col("total_ct") - col("matched_ct")) * 10000L).as("bp_sum"))
      bp.unionByName(none)
        .groupBy(col("touch_type"))
        .agg(sum(col("bp_sum")).cast("long").as("credit_bp_sum"))
        .filter(col("credit_bp_sum") > 0)
        .orderBy("touch_type")
    }

    def oracle: Option[String] = Some(s"""
      WITH t AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id AS touch_id,
               event_type AS touch_type
        FROM events WHERE event_type IN ('view', 'click')),
      p AS (
        SELECT user_id, epoch_us(ts) AS tsu, event_id
        FROM events WHERE event_type = 'purchase'),
      pairs AS (
        SELECT p.event_id, t.tsu AS ttsu, t.touch_id, t.touch_type,
               CAST(pow(2.0, 13 - least(13, (p.tsu - t.tsu) // $DecayUs))
                    AS BIGINT) AS wgt
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.tsu <= p.tsu AND t.tsu >= p.tsu - $ToleranceUs),
      bt AS (
        SELECT event_id, touch_type, sum(wgt) AS w_type,
               max(row(ttsu, touch_id)) AS mx
        FROM pairs GROUP BY 1, 2),
      pe AS (
        SELECT event_id, sum(w_type) AS w_all, max(mx) AS mxall
        FROM bt GROUP BY 1),
      cr AS (
        SELECT bt.event_id, touch_type, mx, mxall,
               (10000 * w_type) // w_all AS base
        FROM bt JOIN pe USING (event_id)),
      rm AS (
        SELECT event_id, 10000 - sum(base) AS rem FROM cr GROUP BY 1),
      bp AS (
        SELECT touch_type,
               base + CASE WHEN mx = mxall THEN rem ELSE 0 END AS bp_sum
        FROM cr JOIN rm USING (event_id)),
      un AS (
        SELECT 'none' AS touch_type, 10000 AS bp_sum FROM p
        WHERE NOT EXISTS (
          SELECT 1 FROM t WHERE t.user_id = p.user_id
           AND t.tsu <= p.tsu AND t.tsu >= p.tsu - $ToleranceUs)),
      allc AS (SELECT * FROM bp UNION ALL SELECT * FROM un)
      SELECT touch_type, CAST(sum(bp_sum) AS BIGINT) AS credit_bp_sum
      FROM allc GROUP BY 1 HAVING sum(bp_sum) > 0 ORDER BY touch_type
    """)
  }

  val all: Seq[GraftQuery] =
    Seq(asofAttribution, asofTolerance, scd2History, scd2Enrich,
      attributionLinear, attributionDecay)
}
