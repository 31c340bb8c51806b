package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product theme-wide aggregation — the reference's ProductStatsApp:
  *
  *  - P9/P10 one-hot source projections (click/favor/cart/order/refund/
  *    comment counters, `RT/app/dws/ProductStatsApp.java:102-248`) →
  *    conditional counters from the lineitem flags.
  *  - A2 keyed tumbling window with exact distinct order-id sets
  *    (`RT/app/dws/ProductStatsApp.java:266-313`) → per-day/sku group with
  *    `count(DISTINCT ...)` (exact, like the reference's HashSet union;
  *    `approx_count_distinct` is the documented 100 TB switch).
  *  - J5 dim join AFTER aggregation to cut lookup volume
  *    (`RT/app/dws/ProductStatsApp.java:317-389`; note the reference's
  *    category3-keyed-on-tm_id bug at :380 is deliberately NOT replicated —
  *    we join each dim on its own key).
  *
  * Scale design: the aggregation shuffles once on (day, sku); the dim join
  * happens on the much smaller aggregate (J5's stated purpose). `part` is
  * broadcast at test scale by AQE; at 100 TB it becomes a shuffle join on
  * the post-agg keys, still far cheaper than pre-agg enrichment.
  */
object ProductStats {

  val stats: GraftQuery = new GraftQuery {
    val name = "product_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val l = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part")
      val agg = l
        .withColumn("dt", date_format(col("l_shipdate"), "yyyy-MM-dd"))
        .groupBy(col("dt"), col("l_partkey"))
        .agg(
          sum(when(col("l_returnflag") === "N" && col("l_linestatus") === "O", 1).otherwise(0))
            .cast("long").as("click_ct"),
          sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("long").as("refund_ct"),
          AggMode.distinctCount(spark, col("l_orderkey")).as("order_ct"),
          AggMode.distinctCount(spark, when(col("l_returnflag") === "R", col("l_orderkey")))
            .as("refund_order_ct"),
          Money.sumCents(col("l_quantity")).as("sku_num_x100"),
          Money.sumCents(col("l_extendedprice")).as("order_amount_cents"))
      agg.join(p, agg("l_partkey") === p("p_partkey"), "left")
        .select(
          col("dt"), col("l_partkey").as("sku_id"), col("p_name").as("sku_name"),
          col("p_brand").as("tm_name"), col("p_type").as("category3_name"),
          col("click_ct"), col("refund_ct"), col("order_ct"), col("refund_order_ct"),
          col("sku_num_x100"), col("order_amount_cents"))
        .orderBy("dt", "sku_id")
    }

    def oracle: Option[String] = Some("""
      WITH agg AS (
        SELECT strftime(l_shipdate, '%Y-%m-%d') AS dt, l_partkey,
               CAST(sum(CASE WHEN l_returnflag = 'N' AND l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS refund_ct,
               count(DISTINCT l_orderkey) AS order_ct,
               count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS refund_order_ct,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sku_num_x100,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents
        FROM lineitem GROUP BY 1, 2)
      SELECT agg.dt, agg.l_partkey AS sku_id, p.p_name AS sku_name,
             p.p_brand AS tm_name, p.p_type AS category3_name,
             agg.click_ct, agg.refund_ct, agg.order_ct, agg.refund_order_ct,
             agg.sku_num_x100, agg.order_amount_cents
      FROM agg LEFT JOIN part p ON agg.l_partkey = p.p_partkey
      ORDER BY dt, sku_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(stats)
}
