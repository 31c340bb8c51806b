package graft

import graft.operators.SkewReport
import org.apache.spark.sql.functions._

/** The key-skew gate on planted distributions (the sf oracle proves the
  * report numbers; these pin the flag rule).
  */
class SkewReportSpec extends SparkSpec {
  import spark.implicits._

  test("a whale key is flagged, an even population is not") {
    // whale owns 300/1000 rows (3000 bp); the rest spread over 700 keys
    val whale = Seq.fill(300)(999L) ++ (1L to 700L)
    val rep = SkewReport.keySkewReport(whale.toDF("k"), col("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rep("999") === ((3000L, 1L)))
    assert(rep.filterNot(_._1 == "999").values.forall(_._2 == 0L))
  }

  test("CMS-grid live flags are a superset of the exact report's") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // real event stream keyed by user, accumulated into the bounded CMS
    // grid across two micro-batches
    val keys = Tables.load(spark, sf, "events")
      .select(col("user_id").cast("string").as("word"))
      .collect().map(_.getString(0))
    val (b1, b2) = keys.splitAt(keys.length / 2)
    val mem = MemoryStream[String]
    val qn = s"skewhh${System.nanoTime()}"
    val q = graft.streaming.HeavyHitters.grid(mem.toDS().toDF("word"))
      .writeStream.format("memory").queryName(qn)
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val grid = spark.table(qn)
      val candidates = keys.distinct.toSeq.toDF("word")
      // a loose 50 bp threshold so both sides flag a non-trivial set
      val live = SkewReport.cmsSkewFlags(grid, candidates, keys.length, 50L)
        .filter(col("flagged") === 1L)
        .collect().map(_.getString(0)).toSet
      val exact = SkewReport.keySkewReport(
          Tables.load(spark, sf, "events"), col("user_id"),
          topN = keys.length, thresholdBp = 50L)
        .filter(col("flagged") === 1L)
        .collect().map(_.getString(0)).toSet
      assert(exact.nonEmpty, "fixture must flag something at 50 bp")
      // CMS only overcounts -> no false negatives
      assert(exact.subsetOf(live), s"missed: ${exact.diff(live)}")
    } finally { q.stop(); CacheRegistry.clear() }
  }

  test("corpus card partials merge to the full-corpus card exactly") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, sf, "documents")
    // two disjoint shards; merging their PARTIAL cards must equal the
    // one-shot card bit for bit (every column is a sum or a set union)
    val s0 = TextAnalysis.cardPartials(docs.filter(col("doc_id") % 2 === 0))
    val s1 = TextAnalysis.cardPartials(docs.filter(col("doc_id") % 2 === 1))
    val merged = TextAnalysis.mergeCards(s0.unionByName(s1))
      .withColumn("lang_set",
        org.apache.spark.sql.functions.sort_array(col("lang_set")))
    val full = TextAnalysis.cardPartials(docs)
      .withColumn("lang_set",
        org.apache.spark.sql.functions.sort_array(col("lang_set")))
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
    assert(full.count() > 0)
  }

  test("flag fires exactly at the floored threshold boundary") {
    // 2 of 100 rows = exactly 200 bp -> flagged; 1 of 100 = 100 bp -> not
    val keys = Seq.fill(2)(1L) ++ Seq.fill(1)(2L) ++ (10L until 107L)
    val rep = SkewReport.keySkewReport(keys.toDF("k"), col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rep("1") === 1L)
    assert(rep("2") === 0L)
  }
}
