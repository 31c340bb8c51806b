package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-skew data-quality gate — the production guard for the two classes
  * of planted 10x findings (a user owning 20% of all events; a 200k-event
  * session): before a per-key pipeline runs, report the top keys by row
  * share and flag any key past a share threshold, so a data bug surfaces
  * as a gate report instead of a degraded straggler task three stages
  * later.
  *
  * Scale shape: ONE map-combined groupBy on the key (partial aggregation
  * collapses even the hottest key to one row per input partition before
  * the shuffle — a count is the one aggregate key skew cannot hurt), the
  * corpus total as an in-plan broadcast scalar, and a TakeOrdered top-N —
  * no global sort, no second scan.
  */
object SkewReport {

  /** Flag threshold: a key owning >= 2% (200 bp) of all rows is suspect
    * for a per-key sequential pipeline (funnel folds, session assembly).
    */
  private[graft] val SkewThresholdBp = 200L

  /** Top-N keys by row share with flags, from any frame and key column.
    * `share_bp` uses double arithmetic from the first multiply (the
    * basket_pairs overflow rule) so the expression is overflow-free and
    * bit-identical cross-engine at any count.
    */
  private[graft] def keySkewReport(df: DataFrame, key: Column,
      topN: Int = 20, thresholdBp: Long = SkewThresholdBp): DataFrame = {
    val byKey = df.groupBy(key.cast("string").as("key"))
      .agg(count(lit(1)).as("ct"))
    val total = df.agg(count(lit(1)).as("total"))
    byKey.join(broadcast(total))
      .withColumn("share_bp",
        floor(col("ct") * lit(10000.0) / col("total")).cast("long"))
      .withColumn("flagged",
        when(col("share_bp") >= thresholdBp, 1L).otherwise(0L))
      .select(col("key"), col("ct"), col("share_bp"), col("flagged"))
      .orderBy(col("ct").desc, col("key"))
      .limit(topN)
  }

  /** LIVE skew flags riding the heavy-hitters grid: point-estimate each
    * candidate key against a (streaming-accumulated) count-min grid and
    * flag keys whose estimated share reaches the threshold. The CMS only
    * ever OVERcounts, so the flagged set is a SUPERSET of the exact
    * report's — a live monitor with no false negatives and depth×width
    * bounded state, where the exact report needs a full-key aggregation.
    * (`streaming.HeavyHitters.grid` over the key column produces the
    * grid; `totalRows` is the stream's running count, a 1-row aggregate.)
    */
  private[graft] def cmsSkewFlags(grid: DataFrame, candidates: DataFrame,
      totalRows: Long, thresholdBp: Long = SkewThresholdBp): DataFrame =
    graft.streaming.HeavyHitters.estimates(grid, candidates)
      .withColumn("share_bp_est",
        floor(col("est_ct") * lit(10000.0) / lit(totalRows)).cast("long"))
      .withColumn("flagged",
        when(col("share_bp_est") >= thresholdBp, 1L).otherwise(0L))

  /** The oracled instance: event ownership per user — the key the whole
    * behavior family shuffles on.
    */
  val keySkew: GraftQuery = new GraftQuery {
    val name = "key_skew_report"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      keySkewReport(Tables.load(spark, sfDir, "events"), col("user_id"))

    def oracle: Option[String] = Some(s"""
      WITH k AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS ct
                 FROM events GROUP BY 1),
      n AS (SELECT count(*) AS total FROM events)
      SELECT key, ct,
             CAST(floor(ct * 10000.0 / total) AS BIGINT) AS share_bp,
             CAST(CASE WHEN floor(ct * 10000.0 / total) >= $SkewThresholdBp
                       THEN 1 ELSE 0 END AS BIGINT) AS flagged
      FROM k CROSS JOIN n
      ORDER BY ct DESC, key LIMIT 20
    """)
  }

  val all: Seq[GraftQuery] = Seq(keySkew)
}
