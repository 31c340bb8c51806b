package graft

import org.apache.spark.sql.functions._

/** The oversized-label guard of dedup_embedding_cosine: at test scale no
  * label exceeds the bound (the oracle proves exactness there); this spec
  * plants a label block ABOVE the bound and proves the sign-bucket
  * sub-division engages, produces a subset of the exact pairs, and leaves
  * under-bound labels untouched.
  */
class DedupGuardSpec extends SparkSpec {

  private val dims = 64

  private def syntheticVecs(n: Int, label: String, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (label.hashCode.toLong * 10000 + i, label,
        Array.fill(dims)(rnd.nextDouble() * 2 - 1))
    }
  }

  private def toFrame(rows: Seq[(Long, String, Array[Double])]) = {
    import spark.implicits._
    graft.expressions.DotProductDouble.register(spark)
    rows.toDF("vec_id", "label", "v")
      .withColumn("nrm", sqrt(expr("dot_double(v, v)")))
  }

  test("oversized label sub-divides; under-bound labels stay exact") {
    val hot = syntheticVecs(120, "hot", 11)
    val cold = syntheticVecs(20, "cold", 22)
    val e = toFrame(hot ++ cold)
    try {
      def pairs(maxBlock: Long) =
        operators.Dedup.blockedCosinePairs(e, maxBlock, 4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = pairs(maxBlock = 1000)   // bound above both blocks
      val guarded = pairs(maxBlock = 50)   // hot (120) over, cold (20) under
      assert(guarded.subsetOf(exact), "guard must never invent pairs")
      assert(guarded.size < exact.size,
        "the planted hot label must lose at least one cross-sub-bucket pair")
      val coldIds = cold.map(_._1).toSet
      assert(exact.filter(p => coldIds(p._1)) == guarded.filter(p => coldIds(p._1)),
        "under-bound label pairs must be identical with and without the guard")
      // the sub-division itself: the hot block splits into several buckets
      val subs = e.filter(col("label") === "hot")
        .withColumn("sub", operators.Similarity.bucketCol(4))
        .select("sub").distinct().count()
      assert(subs > 1, "sign planes must actually split the hot block")
    } finally CacheRegistry.clear()
  }
}
