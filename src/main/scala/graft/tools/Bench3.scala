package graft.tools
object Bench3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("bench3", "local[32]")
    val sf = "/root/testdata/sf0.1"
    Seq("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embedding_cosine", "ann_topk", "ann_lsh", "media_stats").foreach { n =>
      val q = graft.SparkEntry.allQueries.find(_.name == n).get
      val t0 = System.nanoTime()
      val c = q.run(spark, sf).count()
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$c")
    }
    spark.stop()
  }
}
