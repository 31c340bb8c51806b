package graft

import graft.operators.BloomPrefilter

/** Bloom-prefilter invariants beyond the pointwise oracle: candidate sets
  * are supersets of the exact hits (a Bloom can only over-approximate) and
  * the realized false-positive overhead stays in the regime the 8192-bit
  * sizing predicts.
  */
class BloomPrefilterSpec extends SparkSpec {

  test("bloom candidates are a superset of exact hits with bounded FP overhead") {
    val rows = BloomPrefilter.contaminationBloom.run(spark, sf).collect()
    try {
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val bloom = r.getAs[Long]("bloom_hits")
        val exact = r.getAs[Long]("exact_hits")
        val sz = r.getAs[Long]("sz")
        assert(bloom >= exact, s"doc ${r.getAs[Long]("doc_id")}: bloom < exact")
        assert(bloom <= sz, "more candidates than grams")
        assert(r.getAs[Long]("fp_ct") === bloom - exact)
      }
      // corpus-level FP mass: with ~25% bit fill the two-probe FP rate is
      // ~fill^2 ~= 6%; allow 3x headroom before calling the filter broken
      val fp = rows.map(_.getAs[Long]("fp_ct")).sum.toDouble
      val nonHitGrams = rows.map(r => r.getAs[Long]("sz") - r.getAs[Long]("exact_hits")).sum.toDouble
      assert(nonHitGrams > 0)
      assert(fp / nonHitGrams < 0.2,
        s"FP rate ${fp / nonHitGrams} out of regime for an 8192-bit filter")
    } finally CacheRegistry.clear()
  }
}
