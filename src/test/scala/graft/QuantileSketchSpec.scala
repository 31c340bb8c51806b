package graft

import graft.operators.HistQuantiles
import org.apache.spark.sql.functions._

/** The histogram quantile sketch: merge law and the one-bin error bound. */
class QuantileSketchSpec extends SparkSpec {

  private def events = Tables.load(spark, sf, "events")
    .filter(col("value").isNotNull)
    .select(col("event_type"), col("value"), col("event_id"))

  test("histogram grids over a row partition merge by summing counts") {
    val whole = HistQuantiles.histGrid(events.drop("event_id"))
    val a = HistQuantiles.histGrid(
      events.filter(col("event_id") % 2 === 0).drop("event_id"))
    val b = HistQuantiles.histGrid(
      events.filter(col("event_id") % 2 === 1).drop("event_id"))
    val merged = a.unionByName(b)
      .groupBy("event_type", "bin").agg(sum(col("c")).as("c"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("every reported quantile brackets the exact order statistic") {
    val got = HistQuantiles.histQuantiles.run(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val byType = events.select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    assert(byType.nonEmpty && got.nonEmpty)
    for { (t, vs) <- byType; q <- Seq(50L, 90L, 99L) } {
      // exact order statistic at ceil(q*n/100), in cents like the sketch
      val exact = math.round(vs(((vs.length * q + 99) / 100 - 1).toInt) * 100)
      val (lo, hi) = got((t, q))
      assert(exact >= lo && exact < hi,
        s"$t p$q exact $exact outside sketch bin [$lo, $hi)")
    }
  }
}
