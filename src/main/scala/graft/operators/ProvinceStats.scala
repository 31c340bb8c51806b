package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Province theme-wide aggregation — the reference's ProvinceStatsSQLApp
  * (`RT/app/dws/ProvinceStatsSQLApp.java:69-89`): tumbling window over the
  * order stream grouped by province with `COUNT(DISTINCT order_id)` and an
  * amount sum, window bounds emitted as formatted `stt`/`edt` strings.
  *
  * Spark-first shape: declarative join + `groupBy(window(...))`; Catalyst
  * plans a partial/final hash aggregate and AQE sizes the shuffle. `nation`
  * and `region` are broadcast (dimension tables stay small at any scale);
  * `customer` joins by key — at 100 TB that is a shuffle hash join on
  * `o_custkey`, the natural co-partitioning for this query. Money is summed
  * as DECIMAL (exact, order-independent) and emitted as BIGINT cents
  * ([[Money.sumCents]]) so the verify hash is representation-stable.
  */
object ProvinceStats {

  /** orders enriched with province (= nation) / region dims. */
  def orderWithProvince(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
  }

  /** 1-day tumbling province stats (reference uses 10 s windows on a live
    * stream; order event-time here is date-grained, so the tumble is 1 day —
    * same operator, same stt/edt contract).
    */
  val stats: GraftQuery = new GraftQuery {
    val name = "province_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      orderWithProvince(spark, sfDir)
        .groupBy(
          window(col("o_orderdate"), "1 day"),
          col("n_nationkey"), col("n_name"), col("r_name"))
        .agg(
          AggMode.distinctCount(spark, col("o_orderkey")).as("order_count"),
          Money.sumCents(col("o_totalprice")).as("order_amount_cents"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
          date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
          col("n_nationkey").as("province_id"),
          col("n_name").as("province_name"),
          col("r_name").as("region_name"),
          col("order_count"), col("order_amount_cents"))
        .orderBy("stt", "province_id")

    def oracle: Option[String] = Some("""
      SELECT strftime(date_trunc('day', o.o_orderdate), '%Y-%m-%d %H:%M:%S') AS stt,
             strftime(date_trunc('day', o.o_orderdate) + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS edt,
             n.n_nationkey AS province_id,
             n.n_name AS province_name,
             r.r_name AS region_name,
             count(DISTINCT o.o_orderkey) AS order_count,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY stt, province_id
    """)
  }

  /** ADS day-level rollup over the province stats — the publisher's
    * `ProvinceStatsMapper` (`PUB/mapper/ProvinceStatsMapper.java:12-14`):
    * `sum(order_amount), sum(order_count) ... WHERE day GROUP BY province`.
    * Runs as a second aggregation over the pre-aggregate, mirroring the
    * DWS→ADS layering (pre-aggregate once, re-aggregate cheaply).
    */
  val adsProvince: GraftQuery = new GraftQuery {
    val name = "ads_province_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      stats.run(spark, sfDir)
        .groupBy(col("province_id"), col("province_name"), col("region_name"))
        .agg(
          sum(col("order_amount_cents")).cast("long").as("order_amount_cents"),
          sum(col("order_count")).as("order_count"))
        .select("province_id", "province_name", "region_name", "order_amount_cents", "order_count")
        .orderBy("province_id")

    def oracle: Option[String] = Some("""
      WITH stats AS (
        SELECT date_trunc('day', o.o_orderdate) AS stt,
               n.n_nationkey AS province_id, n.n_name AS province_name, r.r_name AS region_name,
               count(DISTINCT o.o_orderkey) AS order_count,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2, 3, 4)
      SELECT province_id, province_name, region_name,
             CAST(sum(order_amount_cents) AS BIGINT) AS order_amount_cents,
             CAST(sum(order_count) AS BIGINT) AS order_count
      FROM stats
      GROUP BY 1, 2, 3
      ORDER BY province_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(stats, adsProvince)
}
