package graft

/** Smoke-level invariants over the registered query set (the DuckDB oracle
  * is the authoritative correctness gate; these catch regressions fast).
  */
class QueriesSpec extends SparkSpec {

  test("every query has a unique name and runs non-empty at sf0.001") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    SparkEntry.allQueries.foreach { q =>
      val n = q.run(spark, sf).count()
      assert(n > 0 || Set("dedup_ngram_jaccard", "dedup_embedding_cosine",
        "dedup_minhash_lsh", "dedup_simhash").contains(q.name),
        s"${q.name} returned 0 rows")
    }
  }

  test("oracle SQL exists for every query (full correctness coverage)") {
    val missing = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
