package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.TextFunctions.duckHexWindow
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct counting, oracled cross-engine.
  *
  * The engine's documented 100 TB switch for exact `count(DISTINCT ...)`
  * is `approx_count_distinct` (AggMode, SURVEY §7.4) — but Spark's HLL++
  * state is engine-private, so that path could never be oracle-checked.
  * This operator implements HLL (Flajolet et al. 2007) from its public
  * definition on an engine-portable md5 register assignment, so BOTH
  * engines compute the identical sketch: bucket = first 16 md5 bits mod
  * 256, rho = 1 + leading zeros of the next 40 bits (string-exact via
  * bin/lpad — no float anywhere in register construction), register =
  * max(rho) per (group, bucket).
  *
  * Scale shape: the register grid is a per-group constant 256 cells with
  * map-side combinable max — the same bounded-state argument as the
  * count-min grid (`Relevance.cmsTopk`), and the estimate is one tiny
  * per-group fold. The exact distinct (the audit column) is the only
  * full-width shuffle in the query; at 100 TB a user drops it and keeps
  * the sketch, which is insensitive to duplicate rows by construction
  * (max over duplicates = max over the set — no pre-distinct needed).
  *
  * Estimator determinism: the harmonic sum is EXACT integer arithmetic —
  * sum over buckets of 2^(41-M_j) (dyadic terms scaled to integers; empty
  * buckets contribute 2^41) — so cross-engine float drift cannot enter
  * through accumulation order. Only the final alpha·m²·2^41 / S division
  * is floating point: one literal-derived constant and one IEEE division,
  * bit-identical on both engines, then floored to BIGINT. The raw
  * estimator is used without the small-range linear-counting branch (its
  * `ln` is transcendental — exactly the cross-engine hazard this query
  * exists to avoid); `empty_buckets` is emitted so the regime is visible,
  * and `err_bp` measures the estimate against the exact count in-row.
  */
object HllDistinct {

  private val Buckets = 256
  private val WBits = 41 // rho range: 1..41 (40 payload bits, 41 = all-zero)
  private val Pow41 = 1L << 41

  /** alpha_256 · 256² · 2^41 — the estimator numerator, computed from the
    * published alpha_m formula with the SAME literals and operation order
    * as the oracle SQL below, so the two doubles are bit-identical.
    */
  private val EstNumerator: Double =
    0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0 * 2199023255552.0

  /** The distinct target: (user, props) interaction pairs per event type. */
  private def elems(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(col("event_type"),
        concat(col("user_id").cast("string"), lit("|"), col("props")).as("elem"))
      .distinct()

  private def rhoCol(w: Column): Column =
    when(w === 0, lit(WBits)).otherwise(instr(lpad(bin(w), 40, "0"), "1"))

  /** The register grid: max rho per (group, bucket). Exposed for the
    * mergeability spec — HLL union is elementwise max, so grids built
    * from any partition of the data combine losslessly.
    */
  private[graft] def hllGrid(df: DataFrame): DataFrame =
    df.withColumn("hx", md5(col("elem")))
      .withColumn("bucket",
        conv(substring(col("hx"), 1, 4), 16, 10).cast("long") % Buckets)
      .withColumn("w", conv(substring(col("hx"), 5, 10), 16, 10).cast("long"))
      .withColumn("rho", rhoCol(col("w")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** Fold a grid to per-group (present, reg_sum): integer-exact. */
  private[graft] def gridFold(grid: DataFrame): DataFrame =
    grid.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("present"),
        sum(pow(lit(2.0), lit(WBits) - col("m")).cast("long")).as("sumpow"))
      .withColumn("reg_sum",
        (col("sumpow") + (lit(Buckets.toLong) - col("present")) * Pow41)
          .cast("long"))
      .withColumn("empty_buckets", (lit(Buckets.toLong) - col("present")))

  val hllDistinct: GraftQuery = new GraftQuery {
    val name = "hll_distinct"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = elems(spark, sfDir)
      val exact = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_ct"))
      gridFold(hllGrid(e))
        .join(exact, "event_type")
        .withColumn("est_ct",
          floor(lit(EstNumerator) / col("reg_sum")).cast("long"))
        .withColumn("err_bp",
          floor(abs(col("est_ct") - col("exact_ct")) * lit(10000.0) /
            col("exact_ct")).cast("long"))
        .select(col("event_type"), col("exact_ct").cast("long").as("exact_ct"),
          col("est_ct"), col("err_bp"),
          col("empty_buckets").cast("long").as("empty_buckets"),
          col("reg_sum"))
        .orderBy("event_type")
    }

    def oracle: Option[String] = Some(s"""
      WITH e0 AS (
        SELECT DISTINCT event_type,
               CAST(user_id AS VARCHAR) || '|' || props AS elem
        FROM events),
      h AS (SELECT event_type, md5(elem) AS hx FROM e0),
      b AS (SELECT event_type,
                   ${duckHexWindow("hx", 0, 4)} % $Buckets AS bucket,
                   ${duckHexWindow("hx", 4, 10)} AS w
            FROM h),
      r AS (SELECT event_type, bucket,
                   CASE WHEN w = 0 THEN $WBits
                        ELSE strpos(lpad(bin(w), 40, '0'), '1') END AS rho
            FROM b),
      g AS (SELECT event_type, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
      s AS (SELECT event_type, count(*) AS present,
                   CAST(sum(CAST(pow(2.0, $WBits - m) AS BIGINT)) AS BIGINT)
                     AS sumpow
            FROM g GROUP BY 1),
      x AS (SELECT event_type, count(*) AS exact_ct FROM e0 GROUP BY 1),
      f AS (SELECT s.event_type, exact_ct,
                   sumpow + ($Buckets - present) * $Pow41 AS reg_sum,
                   $Buckets - present AS empty_buckets
            FROM s JOIN x USING (event_type)),
      est AS (SELECT *,
                     CAST(floor((0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0
                                 * 2199023255552.0) / reg_sum) AS BIGINT)
                       AS est_ct
              FROM f)
      SELECT event_type,
             CAST(exact_ct AS BIGINT) AS exact_ct,
             est_ct,
             CAST(floor(abs(est_ct - exact_ct) * 10000.0 / exact_ct) AS BIGINT)
               AS err_bp,
             CAST(empty_buckets AS BIGINT) AS empty_buckets,
             CAST(reg_sum AS BIGINT) AS reg_sum
      FROM est ORDER BY event_type
    """)
  }

  /** Sliding-window distinct (user, props) interactions via PANE-MERGED
    * HLL grids — the scale answer to `sliding_visitors`' exact form: each
    * event hashes ONCE into its 12-hour pane's register grid; every
    * 24-hour window is then the elementwise max of its 2 panes (HLL union is lossless
    * max-merge, the property `HllSpec` pins). At 100 TB the pane grid is
    * the only event-width aggregation — windows cost |panes|·2·m tiny
    * rows regardless of slide/size ratio, where the exact form re-keys
    * every event per overlapping window. The per-window exact distinct
    * rides along as the audit column (droppable at scale), and the
    * estimate itself hash-matches the oracle exactly as in
    * [[hllDistinct]].
    */
  val hllSliding: GraftQuery = new GraftQuery {
    val name = "hll_sliding"

    private val PaneUs = 43200000000L // 12 hours of micros

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val e = Tables.load(spark, sfDir, "events")
        .select(
          concat(col("user_id").cast("string"), lit("|"), col("props"))
            .as("elem"),
          (unix_micros(col("ts")).cast("long") / PaneUs).cast("long").as("pane"))
      val h = e
        .withColumn("hx", md5(col("elem")))
        .withColumn("bucket",
          conv(substring(col("hx"), 1, 4), 16, 10).cast("long") % Buckets)
        .withColumn("w", conv(substring(col("hx"), 5, 10), 16, 10).cast("long"))
        .withColumn("rho", rhoCol(col("w")))
      val panes = h.groupBy(col("pane"), col("bucket")).agg(max(col("rho")).as("m"))
      val winGrid = panes
        .select(explode(array(col("pane"), col("pane") - 1)).as("win"),
          col("bucket"), col("m"))
        .groupBy(col("win"), col("bucket")).agg(max(col("m")).as("m"))
      val folded = winGrid.groupBy(col("win"))
        .agg(count(lit(1)).as("present"),
          sum(pow(lit(2.0), lit(WBits) - col("m")).cast("long")).as("sumpow"))
        .withColumn("reg_sum",
          (col("sumpow") + (lit(Buckets.toLong) - col("present")) * Pow41)
            .cast("long"))
        .withColumn("est_ct",
          floor(lit(EstNumerator) / col("reg_sum")).cast("long"))
      val exact = e
        .select(explode(array(col("pane"), col("pane") - 1)).as("win"),
          col("elem"))
        .groupBy(col("win"))
        .agg(countDistinct(col("elem")).as("exact_ct"))
      folded.join(exact, "win")
        .select(
          date_format(timestamp_micros(col("win") * PaneUs),
            "yyyy-MM-dd HH:mm:ss").as("stt"),
          col("exact_ct"), col("est_ct"),
          floor(abs(col("est_ct") - col("exact_ct")) * lit(10000.0) /
            col("exact_ct")).cast("long").as("err_bp"),
          col("reg_sum"))
        .orderBy("stt")
    }

    def oracle: Option[String] = Some(s"""
      WITH e AS (SELECT CAST(user_id AS VARCHAR) || '|' || props AS elem,
                        epoch_us(ts) // $PaneUs AS pane
                 FROM events),
      h AS (SELECT pane, elem, md5(elem) AS hx FROM e),
      b AS (SELECT pane,
                   ${duckHexWindow("hx", 0, 4)} % $Buckets AS bucket,
                   ${duckHexWindow("hx", 4, 10)} AS w
            FROM h),
      r AS (SELECT pane, bucket,
                   CASE WHEN w = 0 THEN $WBits
                        ELSE strpos(lpad(bin(w), 40, '0'), '1') END AS rho
            FROM b),
      g AS (SELECT pane, bucket, max(rho) AS m FROM r GROUP BY 1, 2),
      wg AS (SELECT pane - k AS win, bucket, max(m) AS m
             FROM g CROSS JOIN (VALUES (0), (1)) ks(k) GROUP BY 1, 2),
      s AS (SELECT win, count(*) AS present,
                   CAST(sum(CAST(pow(2.0, $WBits - m) AS BIGINT)) AS BIGINT)
                     AS sumpow
            FROM wg GROUP BY 1),
      f AS (SELECT win, sumpow + ($Buckets - present) * $Pow41 AS reg_sum
            FROM s),
      x AS (SELECT pane - k AS win, count(DISTINCT elem) AS exact_ct
            FROM e CROSS JOIN (VALUES (0), (1)) ks(k) GROUP BY 1),
      est AS (SELECT f.win, exact_ct, reg_sum,
                     CAST(floor((0.7213 / (1 + 1.079 / 256.0) * 256.0 * 256.0
                                 * 2199023255552.0) / reg_sum) AS BIGINT)
                       AS est_ct
              FROM f JOIN x ON f.win = x.win)
      SELECT strftime(make_timestamp(win * $PaneUs), '%Y-%m-%d %H:%M:%S')
               AS stt,
             CAST(exact_ct AS BIGINT) AS exact_ct,
             est_ct,
             CAST(floor(abs(est_ct - exact_ct) * 10000.0 / exact_ct)
               AS BIGINT) AS err_bp,
             CAST(reg_sum AS BIGINT) AS reg_sum
      FROM est ORDER BY stt
    """)
  }

  val all: Seq[GraftQuery] = Seq(hllDistinct, hllSliding)
}
