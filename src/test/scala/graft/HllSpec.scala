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

  test("streamed micro-batches accumulate exactly the batch register grid") {
    // the grid core is a plain max aggregation over (group, bucket) —
    // bounded state (groups x 256) a stream can carry in Complete mode,
    // the HeavyHitters argument for the HLL family
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = elems.select("event_type", "elem").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(String, String)]
    val qn = s"hll${System.nanoTime()}"
    val q = HllDistinct.hllGrid(mem.toDS().toDF("event_type", "elem"))
      .writeStream.format("memory").queryName(qn)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    try {
      Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table(qn)
      val batch = HllDistinct.hllGrid(elems.drop("event_id"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
      assert(streamed.count() <= 5 * 256)
    } finally q.stop()
  }

  test("pane-merged sliding grid equals hashing each event per window directly") {
    // hll_sliding (and its oracle) both build windows by max-merging
    // 12 h pane grids; this is the independent check that pane-merge is
    // lossless: explode events into their 2 windows FIRST, hash into
    // per-window grids directly, and compare.
    import org.apache.spark.sql.DataFrame
    val PaneUs = 43200000000L
    val e = Tables.load(spark, sf, "events")
      .select(concat(col("user_id").cast("string"), lit("|"), col("props")).as("elem"),
        (unix_micros(col("ts")).cast("long") / PaneUs).cast("long").as("pane"))
    def registers(df: DataFrame, grp: String) = df
      .withColumn("hx", md5(col("elem")))
      .withColumn("bucket", conv(substring(col("hx"), 1, 4), 16, 10).cast("long") % 256)
      .withColumn("w", conv(substring(col("hx"), 5, 10), 16, 10).cast("long"))
      .withColumn("rho", when(col("w") === 0, lit(41))
        .otherwise(instr(lpad(bin(col("w")), 40, "0"), "1")))
      .groupBy(col(grp), col("bucket")).agg(max(col("rho")).as("m"))
    val direct = registers(
      e.select(explode(array(col("pane"), col("pane") - 1)).as("win"), col("elem")),
      "win")
    val paneMerged = registers(e, "pane")
      .select(explode(array(col("pane"), col("pane") - 1)).as("win"),
        col("bucket"), col("m"))
      .groupBy("win", "bucket").agg(max(col("m")).as("m"))
    assert(direct.exceptAll(paneMerged).isEmpty &&
      paneMerged.exceptAll(direct).isEmpty)
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
