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
    // a segment repeated twice INSIDE one doc is not corpus boilerplate;
    // every reported df must be achievable by >= 2 distinct docs
    val lines = LineDedup.lines.run(spark, sf)
    assert(lines.count() > 0)
    assert(lines.filter(col("df_docs") < 2).count() == 0)
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
