package graft

import graft.operators.{Behavior, SqlSurface}
import org.apache.spark.sql.functions._

/** Cross-surface generator law: for ANY ordered stage list and window,
  * the SQL funnel text generator and the DataFrame funnel build must
  * produce identical results — the two oracled instances pin two
  * points; this pins the generators themselves on a third,
  * never-oracled configuration (a 2-stage funnel with a tight 30-minute
  * window, exercising the degenerate prev==entry stage and a window
  * small enough to expire most conversions).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("funnel SQL generator equals the DataFrame funnel on a third config") {
    val stages = Seq("click", "purchase")
    val windowNs = 30L * 60 * 1000 * 1000 * 1000
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(SqlSurface.funnelSqlText(stages, windowNs))
      .collect().map(_.toSeq)
    val viaDf = Behavior.funnelQuery("funnel_law_probe", stages, windowNs)
      .run(spark, sf).collect().map(_.toSeq)
    assert(viaSql.toSeq === viaDf.toSeq)
    assert(viaSql.nonEmpty)
    // and the generated DuckDB oracle text for the same config parses the
    // same stage count (the three-way generation stays in lockstep)
    val o = Behavior.funnelQuery("funnel_law_probe", stages, windowNs).oracle.get
    assert((1 to stages.length).forall(k => o.contains(s"s$k")))
  }
}
