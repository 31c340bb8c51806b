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

  /** The reference's FULL-WIDTH ProductStats row — all seven fact families
    * of the 7-stream union in ONE wide row per (window, sku)
    * (`RT/app/dws/ProductStatsApp.java:150-292`; bean
    * `RT/bean/ProductStats.java:29-120`): display/click (page log), favor
    * (`favor_info`), cart (`cart_info`), order (OrderWide), payment
    * (PaymentWide), refund (`order_refund_info`), comment + good-comment
    * via the dict-code dim (`GmallConstant` 1201=good).
    *
    * Fact streams are synthesized deterministically from testdata (the
    * [[CdcRoute.envelope]] convention): favor/cart events are suppkey-coded
    * slices of the line stream, payment is the order-status='F' slice of
    * the lineitem⋈orders wide row, comments are an (orderkey+partkey)-coded
    * slice with `l_returnflag='N'` as the good dict code.
    *
    * Spark-first shape: where the reference unions seven bean streams and
    * merges per-family fields in a window reduce, the declarative
    * equivalent is ONE conditional aggregation over the joined scan — each
    * family a `sum(CASE …)` / `count(DISTINCT CASE …)` — and the ORACLE is
    * the literal 7-stream UNION ALL, proving the single-scan rewrite
    * equivalent (the A1/visitor_stats pattern). One shuffle on (dt, sku)
    * plus one on the orderkey join; the dim join stays post-agg (J5).
    * The distinct order-id sets are exact, matching the reference's
    * HashSet union; `AggMode` flips them to HLL sketches at scale.
    */
  val statsFull: GraftQuery = new GraftQuery {
    val name = "product_stats_full"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val l = Tables.load(spark, sfDir, "lineitem")
      val o = Tables.load(spark, sfDir, "orders")
      val p = Tables.load(spark, sfDir, "part")
      val base = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("dt", date_format(col("l_shipdate"), "yyyy-MM-dd"))
      val isComment = pmod(col("l_orderkey") + col("l_partkey"), lit(3)) === 0
      val agg = base.groupBy(col("dt"), col("l_partkey"))
        .agg(
          count(lit(1)).as("display_ct"),
          sum(when(col("l_returnflag") === "N" && col("l_linestatus") === "O", 1)
            .otherwise(0)).cast("long").as("click_ct"),
          sum(when(pmod(col("l_suppkey"), lit(7)) === 0, 1).otherwise(0))
            .cast("long").as("favor_ct"),
          sum(when(pmod(col("l_suppkey"), lit(5)) === 0, 1).otherwise(0))
            .cast("long").as("cart_ct"),
          Money.sumCents(col("l_quantity")).as("order_sku_num_x100"),
          Money.sumCents(col("l_extendedprice")).as("order_amount_cents"),
          AggMode.distinctCount(spark, col("l_orderkey")).as("order_ct"),
          Money.sumCents(when(col("o_orderstatus") === "F", col("l_extendedprice"))
            .otherwise(lit(0))).as("payment_amount_cents"),
          AggMode.distinctCount(spark,
            when(col("o_orderstatus") === "F", col("l_orderkey"))).as("paid_order_ct"),
          Money.sumCents(when(col("l_returnflag") === "R", col("l_extendedprice"))
            .otherwise(lit(0))).as("refund_amount_cents"),
          AggMode.distinctCount(spark,
            when(col("l_returnflag") === "R", col("l_orderkey"))).as("refund_order_ct"),
          sum(when(isComment, 1).otherwise(0)).cast("long").as("comment_ct"),
          sum(when(isComment && col("l_returnflag") === "N", 1).otherwise(0))
            .cast("long").as("good_comment_ct"))
      agg.join(p, agg("l_partkey") === p("p_partkey"), "left")
        .select(
          col("dt"), col("l_partkey").as("sku_id"), col("p_name").as("sku_name"),
          col("p_brand").as("tm_name"), col("p_type").as("category3_name"),
          col("display_ct"), col("click_ct"), col("favor_ct"), col("cart_ct"),
          col("order_sku_num_x100"), col("order_amount_cents"), col("order_ct"),
          col("payment_amount_cents"), col("paid_order_ct"),
          col("refund_amount_cents"), col("refund_order_ct"),
          col("comment_ct"), col("good_comment_ct"))
        .orderBy("dt", "sku_id")
    }

    // the literal 7-stream union the reference runs: each branch projects
    // ONE family into the wide zero-filled bean row; the aggregation then
    // sums every family over the union — proving the Spark single-scan
    // conditional aggregation equivalent
    def oracle: Option[String] = Some("""
      WITH base AS (
        SELECT l.*, o.o_orderstatus,
               strftime(l_shipdate, '%Y-%m-%d') AS dt
        FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey),
      u AS (
        -- 1. page-log display/click stream
        SELECT dt, l_partkey AS sku_id, 1 AS display_ct,
               CASE WHEN l_returnflag = 'N' AND l_linestatus = 'O' THEN 1 ELSE 0 END AS click_ct,
               0 AS favor_ct, 0 AS cart_ct,
               0.0 AS sku_num, 0.0 AS order_amount, NULL AS order_id,
               0.0 AS payment_amount, NULL AS paid_order_id,
               0.0 AS refund_amount, NULL AS refund_order_id,
               0 AS comment_ct, 0 AS good_comment_ct
        FROM base
        UNION ALL  -- 2. favor_info stream
        SELECT dt, l_partkey, 0, 0, 1, 0, 0.0, 0.0, NULL, 0.0, NULL, 0.0, NULL, 0, 0
        FROM base WHERE l_suppkey % 7 = 0
        UNION ALL  -- 3. cart_info stream
        SELECT dt, l_partkey, 0, 0, 0, 1, 0.0, 0.0, NULL, 0.0, NULL, 0.0, NULL, 0, 0
        FROM base WHERE l_suppkey % 5 = 0
        UNION ALL  -- 4. OrderWide stream
        SELECT dt, l_partkey, 0, 0, 0, 0, l_quantity, l_extendedprice, l_orderkey,
               0.0, NULL, 0.0, NULL, 0, 0
        FROM base
        UNION ALL  -- 5. PaymentWide stream
        SELECT dt, l_partkey, 0, 0, 0, 0, 0.0, 0.0, NULL,
               l_extendedprice, l_orderkey, 0.0, NULL, 0, 0
        FROM base WHERE o_orderstatus = 'F'
        UNION ALL  -- 6. order_refund_info stream
        SELECT dt, l_partkey, 0, 0, 0, 0, 0.0, 0.0, NULL, 0.0, NULL,
               l_extendedprice, l_orderkey, 0, 0
        FROM base WHERE l_returnflag = 'R'
        UNION ALL  -- 7. comment_info stream (dict code: returnflag N = good)
        SELECT dt, l_partkey, 0, 0, 0, 0, 0.0, 0.0, NULL, 0.0, NULL, 0.0, NULL,
               1, CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END
        FROM base WHERE (l_orderkey + l_partkey) % 3 = 0),
      agg AS (
        SELECT dt, sku_id,
               CAST(sum(display_ct) AS BIGINT) AS display_ct,
               CAST(sum(click_ct) AS BIGINT) AS click_ct,
               CAST(sum(favor_ct) AS BIGINT) AS favor_ct,
               CAST(sum(cart_ct) AS BIGINT) AS cart_ct,
               CAST(sum(CAST(sku_num AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_sku_num_x100,
               CAST(sum(CAST(order_amount AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents,
               count(DISTINCT order_id) AS order_ct,
               CAST(sum(CAST(payment_amount AS DECIMAL(18,2))) * 100 AS BIGINT) AS payment_amount_cents,
               count(DISTINCT paid_order_id) AS paid_order_ct,
               CAST(sum(CAST(refund_amount AS DECIMAL(18,2))) * 100 AS BIGINT) AS refund_amount_cents,
               count(DISTINCT refund_order_id) AS refund_order_ct,
               CAST(sum(comment_ct) AS BIGINT) AS comment_ct,
               CAST(sum(good_comment_ct) AS BIGINT) AS good_comment_ct
        FROM u GROUP BY 1, 2)
      SELECT agg.dt, agg.sku_id, p.p_name AS sku_name,
             p.p_brand AS tm_name, p.p_type AS category3_name,
             agg.display_ct, agg.click_ct, agg.favor_ct, agg.cart_ct,
             agg.order_sku_num_x100, agg.order_amount_cents, agg.order_ct,
             agg.payment_amount_cents, agg.paid_order_ct,
             agg.refund_amount_cents, agg.refund_order_ct,
             agg.comment_ct, agg.good_comment_ct
      FROM agg LEFT JOIN part p ON agg.sku_id = p.p_partkey
      ORDER BY dt, sku_id
    """)
  }

  val all: Seq[GraftQuery] = Seq(stats, statsFull)
}
