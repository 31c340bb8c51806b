package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relevance, Sampling}

/** Invariants of the score-driven selection operators that the pointwise
  * oracle can't see: the percentile cutoff actually selects the top half
  * (not just any half), and importance-sampled strata realize rates that
  * track their configured quality-derived acceptance.
  */
class SelectionSpec extends SparkSpec {

  test("quality_filter_pct cutoff keeps the HIGHEST-scoring half per language") {
    val out = Relevance.qualityThreshold.run(spark, sf).collect()
    val scores = Relevance.qualityFrame(spark, sf)
      .select(col("lang"), col("qx1m")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    try {
      assert(out.nonEmpty)
      out.foreach { r =>
        val lang = r.getAs[String]("lang")
        val cutoff = r.getAs[Long]("cutoff_bucket")
        val kept = r.getAs[Long]("kept_ct")
        val total = r.getAs[Long]("total_ct")
        val langScores = scores.collect { case (`lang`, q) => q }
        assert(total === langScores.length)
        // recount: docs at or above the cutoff bucket = reported kept
        val recount = langScores.count(q => math.floor(q / 100.0).toLong >= cutoff)
        assert(recount.toLong === kept, s"$lang kept mismatch")
        // at least half kept, and removing the cutoff tie-bucket dips below half
        assert(kept >= (total + 1) / 2)
        val aboveCut = langScores.count(q => math.floor(q / 100.0).toLong > cutoff)
        assert(aboveCut < (total + 1) / 2, s"$lang cutoff not minimal")
      }
    } finally CacheRegistry.clear()
  }

  test("sample_importance keeps higher-quality strata at higher realized rates") {
    val out = Sampling.importance.run(spark, sf).collect()
    try {
      assert(out.length > 1)
      out.foreach { r =>
        val pop = r.getAs[Long]("population_ct")
        val kept = r.getAs[Long]("sample_ct")
        assert(kept >= 0 && kept <= pop)
        // configured rate stays inside the clamp
        val avgRate = r.getAs[Long]("sum_rate_bp").toDouble / pop
        assert(avgRate >= 500 && avgRate <= 10000)
      }
      // corpus-level: realized acceptance tracks the configured rate within
      // a loose statistical band (hash acceptance is uniform per stratum)
      val totPop = out.map(_.getAs[Long]("population_ct")).sum
      val totKept = out.map(_.getAs[Long]("sample_ct")).sum
      val expBp = out.map(_.getAs[Long]("sum_rate_bp")).sum.toDouble / totPop
      val gotBp = totKept * 10000.0 / totPop
      assert(math.abs(gotBp - expBp) < 1500,
        s"realized $gotBp bp vs configured $expBp bp drifted beyond the band")
    } finally CacheRegistry.clear()
  }
}
