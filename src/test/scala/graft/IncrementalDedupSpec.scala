package graft

import org.apache.spark.sql.functions._

/** Batch-equivalence and cross-batch behavior of the persisted-index
  * incremental dedup: the DuckDB oracle proves the end result against the
  * one-shot rule on the real tables; this spec proves it IN-ENGINE against
  * [[operators.Dedup.minhashLsh]]'s own pair output, and pins the
  * cross-batch drop direction on a planted fixture.
  */
class IncrementalDedupSpec extends SparkSpec {

  test("incremental over a 2-way split equals one-shot minhash keepers") {
    try {
      val out = operators.IncrementalDedup.incremental.run(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // one-shot: doc dropped iff some verified pair (a, doc); dup_of = min a
      val pairs = operators.Dedup.minhashLsh.run(spark, sf)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val dupOf = pairs.groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
      val allIds = out.map(_._1)
      val expected = allIds.map(id =>
        (id, if (dupOf.contains(id)) 0L else 1L, dupOf.getOrElse(id, -1L)))
      assert(out.toSeq == expected.toSeq)
      assert(out.exists(_._2 == 0L), "fixture must contain at least one duplicate")
    } finally CacheRegistry.clear()
  }

  test("a new-batch doc duplicating an indexed doc is dropped toward the index") {
    import spark.implicits._
    val text = ("alpha beta gamma delta " * 12).trim
    val oldDocs = Seq(
      (10L, text),
      (11L, "completely different content about oceans tides and currents rolling")
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      (20L, text), // exact dup of indexed doc 10
      (21L, "unique snowflake sentence with nothing shared at all here")
    ).toDF("doc_id", "text")
    val idx = operators.IncrementalDedup.indexDir("spec_fixture")
    try {
      val out = operators.IncrementalDedup.dedupBatches(spark, oldDocs, newDocs, idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq == Seq((10L, 1L, -1L), (11L, 1L, -1L),
        (20L, 0L, 10L), (21L, 1L, -1L)), s"got ${out.toSeq}")
      // the index delta landed: bands for ALL docs are queryable afterwards
      val ids = spark.read.parquet(s"$idx/bands")
        .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(10L, 11L, 20L, 21L))
    } finally CacheRegistry.clear()
  }
}
