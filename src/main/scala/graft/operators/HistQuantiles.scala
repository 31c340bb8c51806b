package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass mergeable quantile sketch: a fixed 1024-bin histogram over
  * integer cents, 64 cents per bin.
  *
  * Completes the percentile scale story the way [[HllDistinct]] completes
  * the distinct story: `event_value_percentiles` is the EXACT two-pass
  * positional selection and its documented approximate switch is Spark's
  * GK sketch (`percentile_approx`) whose state is engine-private — this
  * operator is the oracle-checkable approximate path. Everything is
  * integer arithmetic (DECIMAL-cast cents, integer division for binning
  * and for the ceil-rank), so both engines compute the identical sketch
  * and the identical answer: the first bin whose cumulative count reaches
  * ceil(q·n/100), reported as its [lo, hi) cent bounds — error bounded by
  * one bin width by construction.
  *
  * Scale shape: the only full-width work is the (type, bin) count — map-
  * side combinable into ≤ 1024 cells per group, the CMS/HLL bounded-state
  * argument — then windows and the quantile probe run on the tiny grid.
  * Values above the 655.36 top edge saturate into the last bin (the
  * audit: `hi_cents` of bin 1023 means "overflow"; at these fixtures the
  * domain tops out well below it).
  */
object HistQuantiles {

  private val Bins = 1024L
  private val BinCents = 64L

  /** The (event_type, bin) count grid — exposed for the mergeability
    * spec: histograms over any partition of the rows merge by summing
    * counts.
    */
  private[graft] def histGrid(df: DataFrame): DataFrame =
    df.withColumn("cents", Money.cents(col("value")))
      .withColumn("bin",
        least(lit(Bins - 1), greatest(lit(0L), expr(s"cents div $BinCents"))))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("c"))

  val histQuantiles: GraftQuery = new GraftQuery {
    val name = "hist_quantiles"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val e = Tables.load(spark, sfDir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      val grid = histGrid(e)
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("bin"))))
        .withColumn("n", sum(col("c")).over(
          Window.partitionBy(col("event_type"))))
      val qs = Seq(50, 90, 99).toDF("q")
      grid.crossJoin(broadcast(qs))
        .withColumn("rk", expr("(n * q + 99) div 100"))
        .filter(col("cum") >= col("rk"))
        .groupBy(col("event_type"), col("q").cast("long").as("q"))
        .agg(min(col("bin")).as("bin"))
        .withColumn("lo_cents", col("bin") * BinCents)
        .withColumn("hi_cents", (col("bin") + 1) * BinCents)
        .orderBy("event_type", "q")
    }

    def oracle: Option[String] = Some(s"""
      WITH c AS (
        SELECT event_type,
               least(${Bins - 1},
                     greatest(0, ${Money.centsSql("value")} // $BinCents)) AS bin
        FROM events WHERE value IS NOT NULL),
      g AS (SELECT event_type, bin, count(*) AS c FROM c GROUP BY 1, 2),
      w AS (SELECT event_type, bin,
                   sum(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
                   sum(c) OVER (PARTITION BY event_type) AS n
            FROM g),
      q(q) AS (VALUES (50), (90), (99)),
      t AS (SELECT w.*, q.q, (n * q + 99) // 100 AS rk FROM w CROSS JOIN q)
      SELECT event_type, CAST(q AS BIGINT) AS q,
             CAST(min(bin) AS BIGINT) AS bin,
             CAST(min(bin) * $BinCents AS BIGINT) AS lo_cents,
             CAST((min(bin) + 1) * $BinCents AS BIGINT) AS hi_cents
      FROM t WHERE cum >= rk GROUP BY 1, 2 ORDER BY event_type, q
    """)
  }

  val all: Seq[GraftQuery] = Seq(histQuantiles)
}
