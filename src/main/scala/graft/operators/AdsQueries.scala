package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ADS layer — the publisher's MyBatis query suite (A5/A6,
  * `PUB/mapper/ProductStatsMapper.java:15-41`, `VisitorStatsMapper.java:12-25`):
  * day-level rollups with group + having + order by + limit top-N over the
  * pre-aggregated stats. Re-expressed as a batch query library returning
  * DataFrames (the REST serving layer is out of engine scope per SURVEY §3.3).
  *
  * Every top-N orders by (measure DESC, key ASC) so results are total-ordered
  * and deterministic under any partitioning.
  */
object AdsQueries {

  /** trademark top-N: `sum(order_amount) ... group by tm having >0 order by
    * sum desc limit N` (`PUB/mapper/ProductStatsMapper.java:21-24`).
    */
  val trademarkTopN: GraftQuery = new GraftQuery {
    val name = "ads_trademark_topn"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val l = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand").as("tm_name"))
        .agg(
          Money.sumCents(col("l_extendedprice")).as("order_amount_cents"),
          countDistinct(col("l_orderkey")).as("order_ct"))
        .filter(col("order_amount_cents") > 0)
        .orderBy(col("order_amount_cents").desc, col("tm_name"))
        .limit(10)
    }

    def oracle: Option[String] = Some("""
      SELECT p_brand AS tm_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents,
             count(DISTINCT l_orderkey) AS order_ct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) > 0
      ORDER BY order_amount_cents DESC, tm_name LIMIT 10
    """)
  }

  /** category3 top-N (`PUB/mapper/ProductStatsMapper.java:26-31`). */
  val category3TopN: GraftQuery = new GraftQuery {
    val name = "ads_category3_topn"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val l = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_type").as("category3_name"))
        .agg(
          Money.sumCents(col("l_extendedprice")).as("order_amount_cents"),
          countDistinct(col("l_orderkey")).as("order_ct"))
        .filter(col("order_amount_cents") > 0)
        .orderBy(col("order_amount_cents").desc, col("category3_name"))
        .limit(10)
    }

    def oracle: Option[String] = Some("""
      SELECT p_type AS category3_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents,
             count(DISTINCT l_orderkey) AS order_ct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) > 0
      ORDER BY order_amount_cents DESC, category3_name LIMIT 10
    """)
  }

  /** spu grouping (`PUB/mapper/ProductStatsMapper.java:33-41`): p_size plays
    * the spu grain (part has no mfgr column in the testdata).
    */
  val spuStats: GraftQuery = new GraftQuery {
    val name = "ads_spu_stats"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val l = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_size").as("spu_id"))
        .agg(
          Money.sumCents(col("l_extendedprice")).as("order_amount_cents"),
          countDistinct(col("l_orderkey")).as("order_ct"),
          countDistinct(col("l_partkey")).as("sku_ct"))
        .orderBy("spu_id")
    }

    def oracle: Option[String] = Some("""
      SELECT p_size AS spu_id,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS order_amount_cents,
             count(DISTINCT l_orderkey) AS order_ct,
             count(DISTINCT l_partkey) AS sku_ct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY spu_id
    """)
  }

  /** visitor stats by new/returning (`PUB/mapper/VisitorStatsMapper.java:12-25`):
    * per (day, is_new) uv and pv, is_new derived from first-seen day.
    */
  val newReturning: GraftQuery = new GraftQuery {
    val name = "ads_new_returning"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      LogStats.enriched(spark, sfDir)
        .groupBy(col("day"), col("is_new"))
        .agg(
          countDistinct(col("user_id")).as("uv_ct"),
          count(lit(1)).as("pv_ct"))
        .orderBy("day", "is_new")

    def oracle: Option[String] = Some(LogStats.enrichedOracleSql + """
      SELECT day, is_new,
             count(DISTINCT user_id) AS uv_ct,
             count(*) AS pv_ct
      FROM ev GROUP BY 1, 2 ORDER BY day, is_new
    """)
  }

  /** GMV by order-priority tier with status one-hot counters (the P10
    * builder pattern on the order dimension: conditional counts per
    * status code, like the reference's appraise-code checks).
    */
  val priorityGmv: GraftQuery = new GraftQuery {
    val name = "ads_priority_gmv"

    def run(spark: SparkSession, sfDir: String): DataFrame =
      Tables.load(spark, sfDir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          count(lit(1)).as("order_ct"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("finished_ct"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("long").as("open_ct"),
          Money.sumCents(col("o_totalprice")).as("gmv_cents"))
        .withColumn("finished_ratio_bp",
          floor(col("finished_ct") * lit(10000.0) / col("order_ct")).cast("long"))
        .orderBy("priority")

    def oracle: Option[String] = Some("""
      SELECT o_orderpriority AS priority,
             count(*) AS order_ct,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_ct,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_ct,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS gmv_cents,
             CAST(floor(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT) AS finished_ratio_bp
      FROM orders GROUP BY 1 ORDER BY priority
    """)
  }

  /** Dict-code broadcast dim + appraise-ratio metrics — the reference turns
    * the `base_dic` dimension into a constant dict
    * (`RT/common/GmallConstant.java:24-27`: 1201 good / 1202 soso / 1203
    * bad) and one-hot counts good comments per product
    * (`RT/app/dws/ProductStatsApp.java:228-248`). Here the appraise code is
    * `l_returnflag`, the dict is an in-code table broadcast-joined against
    * the fact (the dict-dim join pattern — at 100 TB the dict stays a
    * broadcast, never a shuffle), and the publisher's good-comment ratio is
    * floor-scaled to basis points.
    */
  val appraiseRatio: GraftQuery = new GraftQuery {
    val name = "ads_appraise_ratio"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val dict = Seq(("N", "appraise_good", 1), ("A", "appraise_soso", 0),
        ("R", "appraise_bad", 0)).toDF("code", "code_name", "is_good")
      val l = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part")
      l.join(broadcast(dict), l("l_returnflag") === dict("code"))
        .join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand").as("tm_name"))
        .agg(
          count(lit(1)).as("comment_ct"),
          sum(col("is_good")).cast("long").as("good_comment_ct"),
          countDistinct(when(col("code_name") === "appraise_bad", col("l_orderkey")))
            .as("bad_order_ct"))
        .withColumn("good_ratio_bp",
          floor(col("good_comment_ct") * lit(10000.0) / col("comment_ct")).cast("long"))
        .orderBy("tm_name")
    }

    def oracle: Option[String] = Some("""
      WITH dict(code, code_name, is_good) AS (
        VALUES ('N', 'appraise_good', 1), ('A', 'appraise_soso', 0),
               ('R', 'appraise_bad', 0))
      SELECT p_brand AS tm_name,
             count(*) AS comment_ct,
             CAST(sum(is_good) AS BIGINT) AS good_comment_ct,
             count(DISTINCT CASE WHEN code_name = 'appraise_bad' THEN l_orderkey END) AS bad_order_ct,
             CAST(floor(sum(is_good) * 10000.0 / count(*)) AS BIGINT) AS good_ratio_bp
      FROM lineitem JOIN dict ON l_returnflag = code
      JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY tm_name
    """)
  }

  val all: Seq[GraftQuery] =
    Seq(trademarkTopN, category3TopN, spuStats, newReturning, priorityGmv, appraiseRatio)
}
