package graft

import graft.operators.ProductQuant

/** The flat-array ADC scorer is a pure plan change: same candidates, same
  * scores, same ranks as the join-form lookup it replaces (DECIMAL partial
  * sums are exact, so fold order cannot matter).
  */
class PqFlatSpec extends SparkSpec {

  test("flat-array ADC equals the join-form ADC row for row") {
    try {
      val join = ProductQuant.annIvfPq.run(spark, sf).collect()
      val flat = ProductQuant.annIvfPqFlat.run(spark, sf).collect()
      assert(join.nonEmpty)
      assert(join.map(_.toSeq).toSeq == flat.map(_.toSeq).toSeq)
    } finally CacheRegistry.clear()
  }
}
