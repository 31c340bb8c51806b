package graft

/** Properties of the count-min heavy-hitters sketch the oracle cannot
  * express: the CMS never undercounts, and the grid is genuinely
  * fixed-size (≤ depth × width cells) no matter the corpus.
  */
class SketchSpec extends SparkSpec {

  test("CMS estimates never undercount and the grid stays fixed-size") {
    try {
      val rows = operators.Relevance.cmsTopk.run(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (word, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
        assert(est >= exact, s"CMS undercounted '$word': est $est < exact $exact")
      }
      // over-estimate bound from the ACTUAL collision mass, not a fixture
      // constant: a row's cell holds exact + colliding-token counts, and
      // the expected collision mass per row is (T - exact) / width < T /
      // width; est = min over depth rows sits below that except in
      // pathological hash alignment, so 8x the per-row expectation is a
      // generous deterministic ceiling that survives fixture/tokenizer
      // changes (the old `<= 2 * exact` broke the moment exact shrank)
      import org.apache.spark.sql.functions._
      val total = graft.Tables.load(spark, sf, "documents")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .count()
      val bound = math.max(1L, 8L * total / operators.Relevance.CmsWidth)
      rows.foreach { r =>
        val (word, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
        assert(est - exact <= bound,
          s"'$word' over-estimate ${est - exact} exceeds 8x collision mass $bound (T=$total)")
      }
    } finally CacheRegistry.clear()
  }
}
