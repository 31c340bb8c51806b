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
      // top-1 of a zipfy token stream should be estimated tightly: its own
      // counts dominate whatever shares its buckets
      val head = rows.head
      assert(head.getLong(2) <= head.getLong(1) * 2,
        s"top term estimate ${head.getLong(2)} should be near exact ${head.getLong(1)}")
    } finally CacheRegistry.clear()
  }
}
