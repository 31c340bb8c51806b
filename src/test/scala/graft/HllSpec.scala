package graft

import graft.operators.HllDistinct
import org.apache.spark.sql.functions._

/** The deterministic-HLL register grid: mergeability and estimate quality. */
class HllSpec extends SparkSpec {

  private def elems = Tables.load(spark, sf, "events")
    .select(col("event_type"),
      concat(col("user_id").cast("string"), lit("|"), col("props")).as("elem"),
      col("event_id"))

  test("hll grid merges by elementwise max (sketch union is lossless)") {
    val whole = HllDistinct.hllGrid(elems.drop("event_id"))
    val a = HllDistinct.hllGrid(elems.filter(col("event_id") % 2 === 0).drop("event_id"))
    val b = HllDistinct.hllGrid(elems.filter(col("event_id") % 2 === 1).drop("event_id"))
    val merged = a.unionByName(b)
      .groupBy("event_type", "bucket").agg(max(col("m")).as("m"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("hll grid is insensitive to duplicate rows (no pre-distinct needed)") {
    val once = HllDistinct.hllGrid(elems.drop("event_id"))
    val tripled = HllDistinct.hllGrid(
      elems.drop("event_id").unionAll(elems.drop("event_id"))
        .unionAll(elems.drop("event_id")))
    assert(once.exceptAll(tripled).isEmpty && tripled.exceptAll(once).isEmpty)
  }

  test("estimate lands within sketch tolerance of the exact count") {
    // sf0.01 so each group (~1.5-1.9k distinct) is clear of the
    // small-range regime for m=256 buckets; the standard error there is
    // 1.04/sqrt(256) ~ 6.5%, so 25% is a >3-sigma bound, not calibration.
    val rows = HllDistinct.hllDistinct.run(spark, "/root/testdata/sf0.01")
      .select("err_bp", "empty_buckets").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < 2500, s"err_bp ${r.getLong(0)} out of band")
      assert(r.getLong(1) == 0L) // every register exercised at this n
    }
  }
}
