package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.Exchange

/** The "swap the weight lookup, keep the plan" claim of
  * doc_quality_trained: the trained-model query must score with a plan
  * of IDENTICAL shuffle count to doc_quality_score (both map-only up to
  * the output sort), while computing a genuinely different model's
  * scores from a parquet weights table that round-trips
  * deterministically.
  */
class TrainedQualitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: Exchange => e }.size

  test("trained scorer keeps the map-only plan: exchange parity with hash scorer") {
    try {
      val hash = operators.Relevance.qualityScore.run(spark, sfDir)
      val trained = operators.Relevance.qualityTrained.run(spark, sfDir)
      assert(exchanges(trained) == exchanges(hash),
        s"trained plan must add no shuffle: ${exchanges(trained)} vs ${exchanges(hash)}")
      // and it is a DIFFERENT model, not the hash weights renamed
      val h = hash.select("doc_id", "quality_x1m").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val t = trained.select("doc_id", "quality_x1m").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(h.keySet == t.keySet, "same docs scored under both models")
      assert(h.exists { case (id, s) => t(id) != s },
        "trained weights must change at least one score")
    } finally CacheRegistry.clear()
  }

  test("weights table round-trips parquet deterministically") {
    val w1 = operators.Relevance.TrainedWeights.load(spark)
    assert(w1.length == expressions.DocQualityTrained.Buckets)
    assert(w1.forall(x => x > -1.0 && x < 1.0), "weights live in (-1, 1)")
    // a fresh read of the persisted artifact reproduces the model exactly
    val w2 = spark.read.parquet(operators.Relevance.TrainedWeights.weightsPath)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(w1.indices.forall(i => w2(i) == w1(i)),
      "parquet round-trip must be bit-exact")
  }
}
