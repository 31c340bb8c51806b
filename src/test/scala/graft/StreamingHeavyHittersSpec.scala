package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming CMS grid must (a) keep bounded state — at most
  * depth × width rows regardless of vocabulary, (b) accumulate across
  * micro-batches to EXACTLY the batch grid of the same tokens, and
  * (c) yield estimates that never undercount the true stream counts.
  */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("streamed grid equals the batch grid and state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq("alpha", "beta", "alpha", "gamma", "delta", "alpha")
    val batch2 = Seq("beta", "alpha", "epsilon", "zeta", "beta", "alpha")
    val all = batch1 ++ batch2

    val mem = MemoryStream[String]
    val qname = s"hh${System.nanoTime()}"
    val q = streaming.HeavyHitters.grid(mem.toDS().toDF("word"))
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()

      val streamed = spark.table(qname)
      assert(streamed.count() <=
        operators.Relevance.CmsDepth.toLong * operators.Relevance.CmsWidth,
        "grid state must stay within depth x width")

      val batchGrid = streaming.HeavyHitters.grid(all.toDF("word"))
      assert(streamed.except(batchGrid).isEmpty && batchGrid.except(streamed).isEmpty,
        "stream-accumulated grid must equal the batch grid of the same tokens")

      val est = streaming.HeavyHitters
        .estimates(streamed, all.distinct.toDF("word"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (w, ct) =>
        assert(est(w) >= ct, s"estimate for '$w' undercounts: ${est(w)} < $ct")
      }
    } finally {
      q.stop()
      CacheRegistry.clear()
    }
  }
}
