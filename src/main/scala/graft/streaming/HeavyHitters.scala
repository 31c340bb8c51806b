package graft.streaming

import graft.operators.Relevance
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming heavy hitters over the count-min grid — the state-bound
  * argument of `term_cms_topk` made live: a token stream aggregated into
  * the fixed 4×1024 counter grid is a STANDARD streaming aggregation
  * whose keyed state can never exceed depth × width rows, no matter how
  * many distinct terms flow past. The unbounded alternative (groupBy the
  * word itself) grows state with vocabulary — the exact failure mode
  * watermarks cannot bound, because a word's count is never "late", it
  * just keeps growing. Estimates read the grid table: est(w) = min over
  * hash rows of the (r, bucket(w)) cell — never an undercount.
  *
  * The grid uses the SAME salted-md5 bucket function as the batch query
  * ([[Relevance.cmsBucket]]), so a grid accumulated by the stream is
  * bit-identical to the batch grid of the same tokens —
  * StreamingHeavyHittersSpec proves it across multiple micro-batches.
  */
object HeavyHitters {

  /** The streaming CMS grid: (r, bucket, cell) from a stream with a
    * `word` column. Complete/update-mode aggregation with ≤ depth×width
    * state rows.
    */
  def grid(words: DataFrame): DataFrame =
    words
      .withColumn("h", Relevance.cmsDigest(col("word")))
      .select(posexplode(array(
        (0 until Relevance.CmsDepth).map(r => Relevance.cmsBucket(r, col("h"))): _*))
        .as(Seq("r", "bucket")))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("cell"))

  /** Point estimates for a set of candidate words against a (batch) grid
    * frame — min over hash rows of the word's cells.
    */
  def estimates(gridDf: DataFrame, words: DataFrame): DataFrame =
    words
      .withColumn("h", Relevance.cmsDigest(col("word")))
      .select(col("word"), posexplode(array(
        (0 until Relevance.CmsDepth).map(r => Relevance.cmsBucket(r, col("h"))): _*))
        .as(Seq("r", "bucket")))
      .join(gridDf, Seq("r", "bucket"))
      .groupBy("word")
      .agg(min(col("cell")).as("est_ct"))
}
