package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level parity evidence: most queries aggregate before comparison so
  * verify output stays small; these two return RAW rows so the oracle gate
  * also proves record-level join/parse semantics.
  */
object RowParity {

  /** The order wide table itself (J1+J4 row grain) for a deterministic
    * keyspace sample — every projected column hash-compared row by row.
    */
  val orderWideRows: GraftQuery = new GraftQuery {
    val name = "order_wide_rows"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      // the ~1% keyspace sample is applied to BOTH join inputs up front
      // (o_orderkey = l_orderkey makes the predicates equivalent) so the
      // join shuffles 1% of each table, not 100% filtered afterwards
      val o = Tables.load(spark, sfDir, "orders")
        .filter(pmod(col("o_orderkey"), lit(97)) === 0)
      val l = Tables.load(spark, sfDir, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(97)) === 0)
      val c = Tables.load(spark, sfDir, "customer")
      val n = Tables.load(spark, sfDir, "nation")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") >= date_add(o("o_orderdate"), -60) &&
            l("l_shipdate") <= date_add(o("o_orderdate"), 60))
        .join(c, o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select(
          col("o_orderkey").as("order_id"),
          col("l_linenumber").as("detail_no"),
          col("o_custkey").as("user_id"),
          col("n_name").as("province_name"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("create_date"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
          Money.cents(col("l_extendedprice")).as("split_total_amount_cents"),
          Money.cents(col("l_quantity")).as("sku_num_x100"))
        .orderBy("order_id", "detail_no", "ship_date", "split_total_amount_cents")
    }

    def oracle: Option[String] = Some("""
      SELECT o.o_orderkey AS order_id,
             l.l_linenumber AS detail_no,
             o.o_custkey AS user_id,
             n.n_name AS province_name,
             strftime(o.o_orderdate, '%Y-%m-%d') AS create_date,
             strftime(l.l_shipdate, '%Y-%m-%d') AS ship_date,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS split_total_amount_cents,
             CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS sku_num_x100
      FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       AND l.l_shipdate >= o.o_orderdate - INTERVAL 60 DAY
       AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderkey % 97 = 0
      ORDER BY order_id, detail_no, ship_date, split_total_amount_cents
    """)
  }

  /** P1 with REAL dirty data: the events feed unioned with malformed JSON
    * payloads (built inline, mirroring the reference's corrupted-log
    * fixture); `get_json_object` nulls them into the dirty side exactly as
    * `from_json` side-outputs in BaseLogApp.
    */
  val dirtySplit: GraftQuery = new GraftQuery {
    val name = "dirty_split"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import spark.implicits._
      val dirty = Seq(
        (-1L, "not json at all"), (-2L, "{\"k\": }"), (-3L, ""), (-4L, "{}"))
        .toDF("event_id", "props")
      val all = Tables.load(spark, sfDir, "events").select("event_id", "props")
        .unionByName(dirty)
      all
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("side", when(col("k").isNull, "dirty").otherwise("clean"))
        .groupBy(col("side"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"))
        .orderBy("side")
    }

    def oracle: Option[String] = Some("""
      WITH allrows AS (
        SELECT event_id, props FROM events
        UNION ALL
        SELECT * FROM (VALUES (-1, 'not json at all'), (-2, '{"k": }'),
                              (-3, ''), (-4, '{}')) AS t(event_id, props)),
      parsed AS (
        SELECT CASE WHEN json_valid(props)
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
        FROM allrows)
      SELECT CASE WHEN k IS NULL THEN 'dirty' ELSE 'clean' END AS side,
             count(*) AS cnt,
             CAST(sum(k) AS BIGINT) AS k_sum
      FROM parsed GROUP BY 1 ORDER BY side
    """)
  }

  val all: Seq[GraftQuery] = Seq(orderWideRows, dirtySplit)
}
