package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.operators.LineDedup

/** Invariants the DuckDB oracle can't see: exact reconstruction of the
  * original document from its segments, the kept+dropped partition law,
  * and the clean pass's broadcast-join shape (the scale claim — the
  * corpus side must never shuffle on the wide segment key).
  */
class LineDedupSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("segments joined in position order reconstruct the document verbatim") {
    // an untouched document's clean fingerprint must equal md5(text) —
    // only true if the segmenter is a partition of the token stream
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("raw_fp"))
    val cleaned = LineDedup.clean.run(spark, sf)
    val joined = cleaned.join(docs, "doc_id")
    val untouched = joined.filter(col("dropped_segs") === 0)
    assert(untouched.count() > 0, "fixture must contain boilerplate-free docs")
    assert(untouched.filter(col("clean_fp") =!= col("raw_fp")).count() == 0,
      "dropped_segs=0 requires clean_fp == md5(text): the segmenter must " +
        "partition the document exactly")
  }

  test("kept + dropped = ceil(words/4) for every document, and some docs are cleaned") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / 4.0).cast("long").as("n_segs"))
    val cleaned = LineDedup.clean.run(spark, sf)
    val joined = cleaned.join(docs, "doc_id")
    assert(joined.filter(col("kept_segs") + col("dropped_segs") =!= col("n_segs"))
      .count() == 0, "every segment must be either kept or dropped")
    assert(cleaned.filter(col("dropped_segs") > 0).count() > 0,
      "fixture must exercise the dropping path (sf0.001 has 40 boilerplate segments)")
  }

  test("boilerplate df threshold counts DISTINCT documents, not occurrences") {
    import spark.implicits._
    // planted fixture: doc 1 contains segment X TWICE, doc 2 once more.
    // Occurrence counting would report df 3; distinct-doc counting must
    // report 2. And a doc-internal-only repeat (Y, twice in doc 3) must
    // not reach the threshold at all.
    val x = "alpha beta gamma delta"
    val y = "eps zeta eta theta"
    val docs = Seq(
      (1L, "s1", s"$x $x"),
      (2L, "s1", s"$x one two three four"),
      (3L, "s1", s"$y $y")).toDF("doc_id", "source", "text")
    val report = LineDedup.boilerplateOf(docs).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(report == Map(x -> 2L),
      s"expected df($x)=2 (distinct docs) and no df row for $y, got $report")
    val fixture = LineDedup.lines.run(spark, sf)
    assert(fixture.count() > 0, "sfDir fixture must surface boilerplate")
  }

  // -- streaming twin: incremental df maintenance ----------------------

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"linededup_$tag").toString

  private def docsOf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def reportRows(df: org.apache.spark.sql.DataFrame) =
    df.select("source", "seg", "df_docs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  // 8-word docs → segment 0 is the first 4 words; the shared block
  // "alpha beta gamma delta" becomes boilerplate per source at df 2
  private val b1 = Seq(
    (1L, "s1", "alpha beta gamma delta one two three four"),
    (2L, "s1", "alpha beta gamma delta five six seven eight"))
  private val b2 = Seq(
    (3L, "s1", "alpha beta gamma delta nine ten eleven twelve"),
    (4L, "s2", "alpha beta gamma delta aa bb cc dd"))
  private val b3 = Seq(
    (5L, "s2", "alpha beta gamma delta ee ff gg hh"),
    (6L, "s2", "unique words only here ii jj kk ll"))

  test("streamed doc batches: boilerplate report equals the batch rebuild after every batch") {
    val root = freshDir("stream") + "/df"
    val batches = Seq(b1, b2, b3)
    var seen = Seq.empty[(Long, String, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.LineDedupStream.applyBatch(docsOf(b), i.toLong + 1, root)
      seen = seen ++ b
      assert(reportRows(
          graft.streaming.LineDedupStream.liveReport(spark, root, 2).get) ==
        reportRows(LineDedup.boilerplateOf(docsOf(seen))),
        s"after batch ${i + 1} the maintained report must equal the rebuild")
      CacheRegistry.clear()
    }
    // the maintained table merged tile-locally: later versions carry files
    def names(v: String) = new java.io.File(s"$root/$v").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert((names("v2") intersect names("v3")).nonEmpty,
      "df maintenance must carry untouched tiles across batches")
    // replay idempotence
    val before = reportRows(
      graft.streaming.LineDedupStream.liveReport(spark, root, 2).get)
    graft.streaming.LineDedupStream.applyBatch(docsOf(b3), 3L, root)
    assert(reportRows(
        graft.streaming.LineDedupStream.liveReport(spark, root, 2).get) == before,
      "a replayed batch must not double-count df")
    // fresh-checkpoint restart (renumbered batch ids) fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.streaming.LineDedupStream.applyBatch(docsOf(b1), 0L, root)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
  }

  test("the line-dedup stream survives a kill-and-resume on its checkpoint") {
    import spark.implicits._
    val work = freshDir("restart")
    val in = s"$work/in"; val ckpt = s"$work/ckpt"; val root = s"$work/df"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val schema = docsOf(b1).schema
    def start() = graft.streaming.LineDedupStream.start(
      spark.readStream.schema(schema).parquet(in), root, ckpt)
    docsOf(b1).coalesce(1).write.mode("append").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    docsOf(b2 ++ b3).coalesce(1).write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(reportRows(
        graft.streaming.LineDedupStream.liveReport(spark, root, 2).get) ==
      reportRows(LineDedup.boilerplateOf(docsOf(b1 ++ b2 ++ b3))),
      "post-restart report must reflect all documents across both runs")
    CacheRegistry.clear()
  }

  test("clean pass broadcasts the boilerplate side (no corpus shuffle on the segment key)") {
    val df = LineDedup.clean.run(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan
    val broadcasts = collect(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(broadcasts.nonEmpty,
      s"the boilerplate join must be a BroadcastHashJoin, plan:\n$plan")
    val sortMerge = collect(plan) {
      case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
    }
    assert(sortMerge.isEmpty,
      "the corpus side must never sort-merge on the wide segment key")
  }
}
