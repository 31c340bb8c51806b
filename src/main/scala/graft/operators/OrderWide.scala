package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Order/payment wide tables — the reference's OrderWideApp / PaymentWideApp:
  *
  *  - J1 event-time interval join order⋈detail, bounds ±5 s inclusive
  *    (`RT/app/dwd/OrderWideApp.java:80-88`); here orders⋈lineitem with
  *    ±60 day bounds (order event time is date-grained in the testdata —
  *    same operator, same inclusive-bounds semantics).
  *  - J2 asymmetric interval join payment⋈order, payment only after the
  *    order (`RT/app/dwd/PaymentWideApp.java:97-105`): [0, +90 days].
  *  - J4 snowflake dim chain user/province/sku/spu/trademark/category3
  *    (`RT/app/dwd/OrderWideApp.java:111-215`) → customer/nation/region/
  *    part/supplier chain.
  *  - P7 derived time columns, P11 age derivation
  *    (`RT/app/dwd/OrderWideApp.java:51-77,123-131`).
  *
  * Scale design: the interval join is an equi-join on the order key with the
  * range as a residual predicate — Catalyst plans a shuffle hash/sort-merge
  * join on the key (never a theta join), so it scales linearly with the
  * shuffle. Tiny dims (nation/region) are broadcast explicitly; customer/
  * part/supplier join by key and would be shuffle joins at 100 TB (they are
  * auto-broadcast at test scale, which AQE decides from runtime sizes).
  * Results are aggregated to month/dimension grain so verify output stays
  * small while any join error still shifts the counts.
  */
object OrderWide {

  /** J1: inclusive-bound interval join + derived time cols. */
  val orderWide: GraftQuery = new GraftQuery {
    val name = "order_wide"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Tables.load(spark, sfDir, "orders")
      val l = Tables.load(spark, sfDir, "lineitem")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") >= date_add(o("o_orderdate"), -60) &&
            l("l_shipdate") <= date_add(o("o_orderdate"), 60))
        .withColumn("create_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy(col("create_month"))
        .agg(
          count(lit(1)).as("wide_ct"),
          countDistinct(col("o_orderkey")).as("order_ct"),
          Money.sumCents(col("l_extendedprice")).as("detail_amount_cents"))
        .orderBy("create_month")
    }

    def oracle: Option[String] = Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS create_month,
             count(*) AS wide_ct,
             count(DISTINCT o_orderkey) AS order_ct,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS detail_amount_cents
      FROM orders JOIN lineitem
        ON o_orderkey = l_orderkey
       AND l_shipdate >= o_orderdate - INTERVAL 60 DAY
       AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
      GROUP BY 1 ORDER BY create_month
    """)
  }

  /** J2: asymmetric bound — "payment" (shipment) strictly within
    * [order time, order time + 90 days], never before the order.
    */
  val paymentWide: GraftQuery = new GraftQuery {
    val name = "payment_wide"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Tables.load(spark, sfDir, "orders")
      val l = Tables.load(spark, sfDir, "lineitem")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") >= o("o_orderdate") &&
            l("l_shipdate") <= date_add(o("o_orderdate"), 90))
        .withColumn("pay_month", date_format(col("l_shipdate"), "yyyy-MM"))
        .groupBy(col("pay_month"))
        .agg(
          count(lit(1)).as("payment_ct"),
          countDistinct(col("o_orderkey")).as("order_ct"),
          Money.sumCents(col("l_extendedprice")).as("payment_amount_cents"))
        .orderBy("pay_month")
    }

    def oracle: Option[String] = Some("""
      SELECT strftime(l_shipdate, '%Y-%m') AS pay_month,
             count(*) AS payment_ct,
             count(DISTINCT o_orderkey) AS order_ct,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS payment_amount_cents
      FROM orders JOIN lineitem
        ON o_orderkey = l_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      GROUP BY 1 ORDER BY pay_month
    """)
  }

  /** J4+P11: the full snowflake dim chain over the wide join —
    * user (customer) → province (nation→region) plus sku (part) and
    * supplier→nation, with the derived age column (years since order,
    * fixed anchor so the value is deterministic).
    */
  val orderWideDims: GraftQuery = new GraftQuery {
    val name = "order_wide_dims"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Tables.load(spark, sfDir, "orders")
      val l = Tables.load(spark, sfDir, "lineitem")
      val c = Tables.load(spark, sfDir, "customer")
      val n = Tables.load(spark, sfDir, "nation")
      val r = Tables.load(spark, sfDir, "region")
      val p = Tables.load(spark, sfDir, "part")
      val s = Tables.load(spark, sfDir, "supplier")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") >= date_add(o("o_orderdate"), -60) &&
            l("l_shipdate") <= date_add(o("o_orderdate"), 60))
        .join(c, o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
        .join(p, l("l_partkey") === p("p_partkey"), "left")
        .join(s, l("l_suppkey") === s("s_suppkey"), "left")
        .withColumn("order_age_years",
          floor(datediff(lit("2026-01-01").cast("date"), col("o_orderdate")) / 365).cast("long"))
        .groupBy(col("r_name").as("region_name"), col("p_brand").as("tm_name"))
        .agg(
          count(lit(1)).as("wide_ct"),
          countDistinct(col("o_orderkey")).as("order_ct"),
          countDistinct(col("s_suppkey")).as("supplier_ct"),
          min(col("order_age_years")).as("min_age_years"),
          max(col("order_age_years")).as("max_age_years"),
          Money.sumCents(col("l_extendedprice")).as("amount_cents"))
        .orderBy("region_name", "tm_name")
    }

    def oracle: Option[String] = Some("""
      SELECT r.r_name AS region_name, p.p_brand AS tm_name,
             count(*) AS wide_ct,
             count(DISTINCT o.o_orderkey) AS order_ct,
             count(DISTINCT s.s_suppkey) AS supplier_ct,
             CAST(min(floor(date_diff('day', o.o_orderdate, DATE '2026-01-01') / 365)) AS BIGINT) AS min_age_years,
             CAST(max(floor(date_diff('day', o.o_orderdate, DATE '2026-01-01') / 365)) AS BIGINT) AS max_age_years,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS amount_cents
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       AND l.l_shipdate >= o.o_orderdate - INTERVAL 60 DAY
       AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN part p ON l.l_partkey = p.p_partkey
      LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2 ORDER BY region_name, tm_name
    """)
  }

  val all: Seq[GraftQuery] = Seq(orderWide, paymentWide, orderWideDims)
}
