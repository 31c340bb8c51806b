package graft

import graft.operators.{AggMode, LogStats, ProductStats, Salted}
import org.apache.spark.sql.functions._

/** The documented 100 TB levers behave: approx-distinct switch, salted
  * aggregation equivalence, and the window-law (windowed sums re-aggregate
  * to the batch totals).
  */
class ScaleLeverSpec extends SparkSpec {

  test("approx-distinct flag swaps HLL in without changing shape") {
    val exact = ProductStats.stats.run(spark, sf)
    spark.conf.set(AggMode.Flag, "true")
    try {
      val approx = ProductStats.stats.run(spark, sf)
      assert(approx.columns.toSeq == exact.columns.toSeq)
      assert(approx.count() == exact.count())
      // HLL estimates stay within 10% on the summed counter at this scale
      val e = exact.agg(sum("order_ct")).head.getLong(0).toDouble
      val a = approx.agg(sum("order_ct")).head.getLong(0).toDouble
      assert(math.abs(a - e) / e < 0.1, s"approx=$a exact=$e")
    } finally spark.conf.unset(AggMode.Flag)
  }

  test("approx-distinct flag covers the behavior/OLAP distinct family") {
    // each query: same schema and row count under the flag, summed
    // distinct counters within 10% of exact (HLL++ rsd 5% default)
    for (name <- Seq("rolling_actives", "cohort_retention", "hourly_visitors")) {
      val counter = Map(
        "rolling_actives" -> "wau_ct", "cohort_retention" -> "active_users",
        "hourly_visitors" -> "uv_ct")(name)
      val exact = SparkEntry.queries(name)(spark, sf)
      val e = exact.agg(sum(counter)).head.getLong(0).toDouble
      val eCols = exact.columns.toSeq
      val eCt = exact.count()
      CacheRegistry.clear()
      spark.conf.set(AggMode.Flag, "true")
      try {
        val approx = SparkEntry.queries(name)(spark, sf)
        assert(approx.columns.toSeq == eCols, name)
        assert(approx.count() == eCt, name)
        val a = approx.agg(sum(counter)).head.getLong(0).toDouble
        assert(math.abs(a - e) / e < 0.1, s"$name: approx=$a exact=$e")
      } finally { spark.conf.unset(AggMode.Flag); CacheRegistry.clear() }
    }
  }

  test("approx-percentile flag swaps the GK sketch in without changing shape") {
    val exact = operators.Relevance.percentiles.run(spark, sf).collect()
    spark.conf.set(AggMode.PercentileFlag, "true")
    try {
      val approx = operators.Relevance.percentiles.run(spark, sf).collect()
      assert(approx.length == exact.length)
      exact.zip(approx).foreach { case (e, a) =>
        assert(e.getString(0) == a.getString(0))
        assert(e.getLong(1) == a.getLong(1)) // n is exact on both paths
        // GK at accuracy 10000 stays within 1% of the exact positional
        // values at this scale (and is exact while n < accuracy)
        Seq(2, 3, 4).foreach { i =>
          val ev = e.getDouble(i); val av = a.getDouble(i)
          assert(math.abs(av - ev) <= math.abs(ev) * 0.01 + 1e-9,
            s"${e.getString(0)} p[$i]: approx=$av exact=$ev")
        }
      }
    } finally spark.conf.unset(AggMode.PercentileFlag)
  }

  test("salted aggregation equals direct aggregation") {
    val events = Tables.load(spark, sf, "events")
    val salted = Salted.saltedSumCount(events, Seq("event_type"), "value", salts = 8)
      .orderBy("event_type").collect()
    val direct = events.groupBy("event_type")
      .agg(sum("value").as("value_sum"), count(lit(1)).as("cnt"))
      .orderBy("event_type").collect()
    assert(salted.length == direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) == d.getString(0))
      assert(math.abs(s.getDouble(1) - d.getDouble(1)) < 1e-6)
      assert(s.getLong(2) == d.getLong(2))
    }
  }

  test("window law: visitor stats windows re-aggregate to batch totals") {
    val vs = LogStats.visitorStats.run(spark, sf)
      .agg(sum("pv_ct").as("pv"), sum("uv_ct").as("uv")).head
    val events = Tables.load(spark, sf, "events")
    assert(vs.getLong(0) == events.count())
    val uvBatch = LogStats.enriched(spark, sf).agg(sum("uv_flag")).head.getLong(0)
    assert(vs.getLong(1) == uvBatch)
  }
}
