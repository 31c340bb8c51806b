package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven CDC routing — the reference's BaseDBApp + TableProcessFunction:
  *
  *  - S4 CDC envelope `{database, tableName, type, before, after}`
  *    (`RT/app/function/CustomerDeserialization.java:26-72`), synthesized
  *    here from the `orders` table (status → change type).
  *  - P2 delete filter (`RT/app/dwd/BaseDBApp.java:58-66`).
  *  - P6 broadcast-config router: config keyed (sourceTable, operateType)
  *    decides sink type + table; unmatched records dropped
  *    (`RT/app/function/TableProcessFunction.java:28-156`).
  *  - P5 column pruning by the config's sinkColumns CSV
  *    (`RT/app/function/TableProcessFunction.java:165-177`), done with
  *    `map_filter` over the dynamic payload map.
  *
  * Spark-first shape: the config is a tiny inline DataFrame broadcast into
  * an equi-join — the exact analog of Flink's broadcast state, but
  * declarative; per-micro-batch routing reuses this same plan inside
  * `foreachBatch` (see `graft.streaming.CdcPipeline`).
  */
object CdcRoute {

  /** Synthesize the CDC envelope stream from `orders`: schema-dynamic
    * payload (`after` map) inside the schema-fixed envelope.
    */
  def envelope(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(
        lit("graft").as("database"),
        lit("order_info").as("tableName"),
        when(col("o_orderstatus") === "O", "insert")
          .when(col("o_orderstatus") === "P", "update")
          .otherwise("delete").as("type"),
        col("o_orderkey").as("op_seq"), // change-log sequence stand-in
        map(
          lit("id"), col("o_orderkey").cast("string"),
          lit("user_id"), col("o_custkey").cast("string"),
          lit("total_amount"), col("o_totalprice").cast("string"),
          lit("order_priority"), col("o_orderpriority")).as("after"))

  /** Inline `table_process` config rows (FIXTURES.md §3). */
  def config(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("order_info", "insert", "kafka", "dwd_order_info", "id,user_id,total_amount"),
      ("order_info", "update", "hbase", "dim_order_info", "id,total_amount"))
      .toDF("source_table", "operate_type", "sink_type", "sink_table", "sink_columns")
  }

  val route: GraftQuery = new GraftQuery {
    val name = "cdc_route"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val env = envelope(spark, sfDir).filter(col("type") =!= "delete")
      val cfg = config(spark)
      env
        .join(broadcast(cfg),
          env("tableName") === cfg("source_table") && env("type") === cfg("operate_type"))
        .withColumn("kept_cols", split(col("sink_columns"), ","))
        .withColumn("pruned",
          map_filter(col("after"), (k, _) => array_contains(col("kept_cols"), k)))
        .groupBy(col("sink_type"), col("sink_table"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(size(col("pruned"))).cast("long").as("col_cells"))
        .orderBy("sink_type", "sink_table")
    }

    def oracle: Option[String] = Some("""
      WITH env AS (
        SELECT 'order_info' AS table_name,
               CASE o_orderstatus WHEN 'O' THEN 'insert'
                                  WHEN 'P' THEN 'update'
                                  ELSE 'delete' END AS type
        FROM orders
      ), cfg(source_table, operate_type, sink_type, sink_table, n_cols) AS (
        VALUES ('order_info', 'insert', 'kafka', 'dwd_order_info', 3),
               ('order_info', 'update', 'hbase', 'dim_order_info', 2)
      )
      SELECT sink_type, sink_table, count(*) AS cnt,
             CAST(sum(n_cols) AS BIGINT) AS col_cells
      FROM env JOIN cfg
        ON env.table_name = cfg.source_table AND env.type = cfg.operate_type
      WHERE env.type <> 'delete'
      GROUP BY 1, 2 ORDER BY sink_type, sink_table
    """)
  }

  /** S3 startup phases — the reference runs its CDC source with
    * `StartupOptions.initial()` (`RT/app/dwd/BaseDBApp.java:76`): a
    * snapshot of every existing row (Debezium READ op → type `read`)
    * precedes the incremental change stream. Modeled with a phase-ordered
    * change sequence: snapshot records carry op_seq 0, stream records their
    * log position, and the materialized table state is keep-latest per key —
    * a key whose latest change is a delete is RETAINED and surfaced under
    * final_op='delete' (a downstream sink would drop it at apply time; the
    * query reports the routing decision, not the post-apply table).
    * Stream updates rewrite the amount, so
    * the checksum proves precedence (a snapshot row only survives where no
    * later change touched the key). The keep-latest window partitions on
    * the table key — a fine key at any scale.
    */
  val snapshotStream: GraftQuery = new GraftQuery {
    val name = "cdc_snapshot_stream"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.load(spark, sfDir, "orders")
      val snap = o.select(
        col("o_orderkey").as("id"), lit("read").as("type"),
        lit(0L).as("op_seq"), col("o_totalprice").as("total_amount"))
      val strm = o.filter(pmod(col("o_orderkey"), lit(3)) === 0).select(
        col("o_orderkey").as("id"),
        when(col("o_orderstatus") === "O", "insert")
          .when(col("o_orderstatus") === "P", "update")
          .otherwise("delete").as("type"),
        // +1 keeps stream op_seqs strictly after the snapshot's 0 (orderkey
        // 0 exists in the testdata; a tie would make keep-latest arbitrary)
        (col("o_orderkey") + 1).as("op_seq"),
        (col("o_totalprice") * lit(2)).as("total_amount"))
      val w = Window.partitionBy(col("id")).orderBy(col("op_seq").desc)
      snap.unionByName(strm)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("type").as("final_op"))
        .agg(
          count(lit(1)).as("cnt"),
          Money.sumCents(col("total_amount")).as("amount_cents"))
        .orderBy("final_op")
    }

    def oracle: Option[String] = Some("""
      WITH snap AS (
        SELECT o_orderkey AS id, 'read' AS type, 0 AS op_seq,
               o_totalprice AS total_amount
        FROM orders),
      strm AS (
        SELECT o_orderkey, CASE o_orderstatus WHEN 'O' THEN 'insert'
                                              WHEN 'P' THEN 'update'
                                              ELSE 'delete' END,
               o_orderkey + 1, o_totalprice * 2
        FROM orders WHERE o_orderkey % 3 = 0),
      u AS (SELECT * FROM snap UNION ALL SELECT * FROM strm),
      r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY op_seq DESC) AS rn FROM u)
      SELECT type AS final_op, count(*) AS cnt,
             CAST(sum(CAST(total_amount AS DECIMAL(18,2))) * 100 AS BIGINT) AS amount_cents
      FROM r WHERE rn = 1 GROUP BY 1 ORDER BY final_op
    """)
  }

  val all: Seq[GraftQuery] = Seq(route, snapshotStream)
}
