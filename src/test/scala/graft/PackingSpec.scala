package graft

import org.apache.spark.sql.functions._

/** Structural laws of the sequence-packing prefix sum that the pointwise
  * oracle hash cannot state directly: offsets are gapless and the bin
  * ranges tile the token stream.
  */
class PackingSpec extends SparkSpec {

  test("pack_sequences offsets form an exact gapless prefix sum") {
    val out = operators.Packing.packSequences.run(spark, sf)
      .select("doc_id", "n_tokens", "tok_offset", "bin_first", "bin_last")
      .collect().sortBy(_.getLong(0))
    try {
      assert(out.nonEmpty)
      var expected = 0L
      out.foreach { r =>
        assert(r.getLong(2) == expected,
          s"doc ${r.getLong(0)}: offset ${r.getLong(2)} != running sum $expected")
        // bin range is exactly the chunks the doc's token span covers
        assert(r.getLong(3) == r.getLong(2) / 512)
        assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 512)
        expected += r.getLong(1)
      }
      // the final bin index covers the whole stream: total tokens div 512
      assert(out.last.getLong(4) == (expected - 1) / 512)
    } finally CacheRegistry.clear()
  }
}
