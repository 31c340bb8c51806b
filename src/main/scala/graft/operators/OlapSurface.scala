package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * full-width shuffle) and the ntile scores come from [[Ranks.distNtile]]
  * — exact SQL ntile via range-partition + per-range offsets, so the
  * per-customer rollup (billions of rows at 100 TB) never funnels
  * through a single-partition window; only a P-row offsets frame does.
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
      Ranks.distNtile(per, 10, "decile",
          col("rev_cents").desc, col("o_custkey"))
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

  /** RFM customer segmentation: recency (days from the corpus's last
    * order day), frequency, monetary per customer, each ntile(5)-scored
    * under a deterministic total order, rolled up to the ≤125-cell
    * segment grid. The global reference day comes from a broadcast
    * 1-row aggregate (`dedup_semantic`'s in-plan scalar pattern); the
    * three scores come from [[Ranks.distNtile]], so even the
    * per-customer rollup never serializes through one task.
    */
  val rfmSegments: GraftQuery = new GraftQuery {
    val name = "rfm_segments"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val o = Tables.load(spark, sfDir, "orders")
      val per = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_day"),
          count(lit(1)).as("freq"),
          Money.sumCents(col("o_totalprice")).as("mon_cents"))
      val refDay = o.agg(max(to_date(col("o_orderdate"))).as("ref_day"))
      val base = per.join(broadcast(refDay))
        .withColumn("recency_days",
          datediff(col("ref_day"), col("last_day")).cast("long"))
      // all three rankings in ONE range exchange over a tagged union —
      // chaining distNtile paid 3x (exchange + persist + offsets) and
      // re-ranked the previous pass's joined output each time; mon_cents
      // rides along in the pivot, so no join back to the base either
      val scored = Ranks.distNtileScores(base, "o_custkey", 5, Seq(
        Ranks.NtileSpec("r_score", col("recency_days"), asc = true),
        Ranks.NtileSpec("f_score", col("freq"), asc = false),
        Ranks.NtileSpec("m_score", col("mon_cents"), asc = false,
          carryAs = Some("mon_cents"))))
      scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("customers"),
          sum(col("mon_cents")).as("mon_cents"))
        .select(
          concat(col("r_score"), col("f_score"), col("m_score")).as("segment"),
          col("customers"), col("mon_cents"))
        .orderBy("segment")
    }

    def oracle: Option[String] = Some(s"""
      WITH per AS (
        SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
               count(*) AS freq,
               ${Money.sumCentsSql("o_totalprice")} AS mon_cents
        FROM orders GROUP BY 1),
      ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
      scored AS (
        SELECT per.*,
               date_diff('day', last_day, ref_day) AS recency_days,
               ntile(5) OVER (ORDER BY date_diff('day', last_day, ref_day),
                 o_custkey) AS r_score,
               ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
               ntile(5) OVER (ORDER BY mon_cents DESC, o_custkey) AS m_score
        FROM per CROSS JOIN ref)
      SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment,
             count(*) AS customers,
             CAST(sum(mon_cents) AS BIGINT) AS mon_cents
      FROM scored GROUP BY r_score, f_score, m_score ORDER BY segment
    """)
  }

  /** Market-basket co-occurrence with lift: part types ordered together
    * in one order. The self-join is equi-keyed on the order id, so pair
    * fan-out is bounded by the per-order distinct-type count (≤ items
    * per order), never the corpus; type marginals broadcast. Lift is
    * floor basis points of P(a,b) / (P(a)·P(b)); the product promotes to
    * double at the FIRST multiply (pair_ct * 10000.0 * n_orders, same
    * left-assoc order in both engines) so the expression is overflow-free
    * at any count scale and bit-identical cross-engine.
    */
  val basketPairs: GraftQuery = new GraftQuery {
    val name = "basket_pairs"

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Tables.load(spark, sfDir, "lineitem")
      val p = Tables.load(spark, sfDir, "part")
      // the per-order distinct type set feeds FOUR consumers (both pair
      // sides, marginals, the order count); un-persisted, Catalyst
      // recomputes the lineitem scan + broadcast join + distinct per
      // consumer (the differing projections defeat ReuseExchange) —
      // plan-audited at 5 lineitem scans, 1 after the persist
      val ot = graft.CacheRegistry.persist(
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .select(col("l_orderkey").as("okey"), col("p_type")).distinct())
      val ot2 = ot.select(col("okey"), col("p_type").as("type_b"))
      val pairs = ot.join(ot2, "okey")
        .filter(col("p_type") < col("type_b"))
        .groupBy(col("p_type").as("type_a"), col("type_b"))
        .agg(count(lit(1)).as("pair_ct"))
      val marg = ot.groupBy(col("p_type"))
        .agg(count(lit(1)).as("type_ct"))
      val n = ot.select(countDistinct(col("okey")).as("n_orders"))
      pairs
        .join(broadcast(marg.select(col("p_type").as("type_a"),
          col("type_ct").as("ct_a"))), "type_a")
        .join(broadcast(marg.select(col("p_type").as("type_b"),
          col("type_ct").as("ct_b"))), "type_b")
        .join(broadcast(n))
        .select(col("type_a"), col("type_b"), col("pair_ct"),
          floor(col("pair_ct") * lit(10000.0) * col("n_orders") /
            (col("ct_a") * col("ct_b"))).as("lift_bp"))
        .orderBy(col("pair_ct").desc, col("type_a"), col("type_b"))
    }

    def oracle: Option[String] = Some("""
      WITH ot AS (
        SELECT DISTINCT l_orderkey AS okey, p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      pairs AS (
        SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS pair_ct
        FROM ot a JOIN ot b ON a.okey = b.okey AND a.p_type < b.p_type
        GROUP BY 1, 2),
      marg AS (SELECT p_type, count(*) AS type_ct FROM ot GROUP BY 1),
      n AS (SELECT count(DISTINCT okey) AS n_orders FROM ot)
      SELECT type_a, type_b, CAST(pair_ct AS BIGINT) AS pair_ct,
             CAST(floor(pair_ct * 10000.0 * n_orders / (ma.type_ct * mb.type_ct))
               AS BIGINT) AS lift_bp
      FROM pairs
      JOIN marg ma ON ma.p_type = type_a
      JOIN marg mb ON mb.p_type = type_b
      CROSS JOIN n
      ORDER BY pair_ct DESC, type_a, type_b
    """)
  }

  val all: Seq[GraftQuery] =
    Seq(rollupGmv, runningGmv, customerDeciles, pivotDaily, rfmSegments,
      basketPairs)
}
