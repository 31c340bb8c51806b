package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic OLAP surface demonstrations the warehouse suites lean on but no
  * other module exercises: multi-level ROLLUP, running/moving window
  * frames, and ntile bucketing. All native Spark operators (Catalyst's
  * `Expand` handles the rollup grouping sets in one pass; window frames
  * stay inside one partition-level sort), all exact-integer via cents.
  *
  * Scale shapes: the rollup is ONE aggregation over an Expand (3 rows per
  * input here — the grouping-set count, not data-dependent); the window
  * queries are one customer-key shuffle each with frames evaluated in a
  * single sorted pass; deciles aggregate per-customer first (the only
  * full-width shuffle) and ntile runs over the 1k-row customer rollup.
  */
object OlapSurface {

  /** GMV rollup over region → nation with subtotal and grand-total rows
    * (NULL dims canonicalized to '(all)' so the levels are unambiguous
    * cross-engine).
    */
  val rollupGmv: GraftQuery = new GraftQuery {
    val name = "rollup_gmv"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Tables.load(spark, sfDir, "orders")
      val c = Tables.load(spark, sfDir, "customer")
      val n = Tables.load(spark, sfDir, "nation")
      val r = Tables.load(spark, sfDir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(Money.sumCents(col("o_totalprice")).as("gmv_cents"),
          count(lit(1)).as("order_ct"))
        .select(
          coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("gmv_cents"), col("order_ct"))
        .orderBy("region", "nation")
    }

    def oracle: Option[String] = Some(s"""
      SELECT coalesce(r_name, '(all)') AS region,
             coalesce(n_name, '(all)') AS nation,
             ${Money.sumCentsSql("o_totalprice")} AS gmv_cents,
             count(*) AS order_ct
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation
    """)
  }

  /** Per-customer running and 3-order moving GMV — the window-frame
    * staple: one customer shuffle, both frames in one sorted pass.
    */
  val runningGmv: GraftQuery = new GraftQuery {
    val name = "running_gmv"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(spark, sfDir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          Money.cents(col("o_totalprice")).as("cents"))
        .withColumn("run_cents",
          sum(col("cents")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("mov3_cents",
          sum(col("cents")).over(w.rowsBetween(-2, 0)))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
          col("cents"), col("run_cents"), col("mov3_cents"))
        .orderBy("o_custkey", "o_orderkey")
    }

    def oracle: Option[String] = Some(s"""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             ${Money.centsSql("o_totalprice")} AS cents,
             CAST(sum(${Money.centsSql("o_totalprice")}) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents,
             CAST(sum(${Money.centsSql("o_totalprice")}) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS mov3_cents
      FROM orders ORDER BY o_custkey, o_orderkey
    """)
  }

  /** Customer revenue deciles: ntile(10) over the per-customer rollup
    * under a deterministic total order, then per-decile aggregates.
    */
  val customerDeciles: GraftQuery = new GraftQuery {
    val name = "customer_deciles"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val per = Tables.load(spark, sfDir, "orders")
        .groupBy(col("o_custkey"))
        .agg(Money.sumCents(col("o_totalprice")).as("rev_cents"),
          count(lit(1)).as("order_ct"))
      per
        .withColumn("decile", ntile(10).over(
          Window.orderBy(col("rev_cents").desc, col("o_custkey"))))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("customers"),
          sum(col("rev_cents")).as("rev_cents"),
          min(col("rev_cents")).as("min_cents"),
          max(col("rev_cents")).as("max_cents"),
          sum(col("order_ct")).as("order_ct"))
        .select(col("decile").cast("long").as("decile"), col("customers"),
          col("rev_cents"), col("min_cents"), col("max_cents"),
          col("order_ct"))
        .orderBy("decile")
    }

    def oracle: Option[String] = Some(s"""
      WITH per AS (
        SELECT o_custkey, ${Money.sumCentsSql("o_totalprice")} AS rev_cents,
               count(*) AS order_ct
        FROM orders GROUP BY 1),
      t AS (SELECT *, ntile(10) OVER (ORDER BY rev_cents DESC, o_custkey)
                        AS decile
            FROM per)
      SELECT CAST(decile AS BIGINT) AS decile,
             count(*) AS customers,
             CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
             CAST(min(rev_cents) AS BIGINT) AS min_cents,
             CAST(max(rev_cents) AS BIGINT) AS max_cents,
             CAST(sum(order_ct) AS BIGINT) AS order_ct
      FROM t GROUP BY 1 ORDER BY decile
    """)
  }

  /** The event-type dimension pivoted to columns per day — the
    * `Dataset.pivot` surface with an EXPLICIT value list (an unlisted
    * pivot would scan once just to discover values; the reference's
    * event vocabulary is closed). One aggregation; missing cells are 0.
    */
  val pivotDaily: GraftQuery = new GraftQuery {
    val name = "pivot_daily"

    private val types = Seq("click", "error", "purchase", "signup", "view")

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val pivoted = Tables.load(spark, sfDir, "events")
        .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .count()
      pivoted.select(col("day") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("day")
    }

    def oracle: Option[String] = {
      val cols = types.map(t =>
        s"CAST(count(CASE WHEN event_type = '$t' THEN 1 END) AS BIGINT) AS $t")
        .mkString(",\n             ")
      Some(s"""
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             $cols
      FROM events GROUP BY 1 ORDER BY day
      """)
    }
  }

  val all: Seq[GraftQuery] =
    Seq(rollupGmv, runningGmv, customerDeciles, pivotDaily)
}
