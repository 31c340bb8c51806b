package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit salted join — the skew lever [[SkewReport]] only REPORTS.
  *
  * A hash join on a skewed key puts every row of the hot key in one
  * task; AQE's skew-join split handles sort-merge joins it can see, but
  * a pre-salted join is the portable form that also covers aggregations
  * feeding the join and engines/states where AQE cannot re-plan (e.g. a
  * streaming dedup keyed by a hot key). Mechanics: the probe side gains
  * a deterministic salt in [0, salts); the build side replicates each
  * row across ALL salt values; the join keys on (key, salt) — each hot
  * key now spreads over `salts` tasks, and each probe row still matches
  * exactly one replica, so the result is row-for-row the unsalted join.
  */
object SaltedJoin {

  /** `fact ⋈ dim` on `key`, salted `salts` ways. `saltExpr` must be
    * deterministic per fact row — any such expression yields the
    * identical (unsalted) result; pick one that spreads the HOT key's
    * rows (a line number, a hash of non-key columns), never the join key
    * itself (that would put each key's rows back in one bucket).
    * Build-side cost: `salts`× replication — size the salt count to the
    * skew, not the cluster.
    *
    * The salt is normalized defensively — `pmod(saltExpr, salts)` with
    * nulls mapped to 0 — because a raw value outside [0, salts) or a
    * null would find no dim replica in the inner (key, salt) join and
    * silently DROP fact rows: a contract slip must skew one bucket, not
    * corrupt the result.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltExpr: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "inputs must not already carry a _salt column")
    val salted = fact.withColumn("_salt",
      coalesce(pmod(saltExpr.cast("int"), lit(salts)), lit(0)))
    val repl = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(repl, Seq(key, "_salt")).drop("_salt")
  }

  /** Order-priority revenue through an 8-way salted lineitem ⋈ orders —
    * oracled against the PLAIN join: the salt must be invisible in the
    * result (hash equality IS the replication-correctness proof).
    */
  val saltedRevenue: GraftQuery = new GraftQuery {
    val name = "skew_join_salted"
    private val Salts = 8

    def run(spark: SparkSession, sfDir: String): DataFrame = {
      val li = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_linenumber"))
      val ord = Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      saltedJoin(li, ord, "l_orderkey", Salts,
          pmod(col("l_linenumber"), lit(Salts)))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("line_ct"),
          Money.sumCents(col("l_extendedprice")).as("revenue_cents"))
        .orderBy("o_orderpriority")
    }

    def oracle: Option[String] = Some(s"""
      SELECT o_orderpriority, count(*) AS line_ct,
             ${Money.sumCentsSql("l_extendedprice")} AS revenue_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1 ORDER BY 1
    """)
  }

  val all: Seq[GraftQuery] = Seq(saltedRevenue)
}
