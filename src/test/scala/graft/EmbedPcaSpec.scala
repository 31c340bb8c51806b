package graft

import graft.operators.EmbedPca
import org.apache.spark.sql.functions._

/** The exact integer top-eigenvector ([[EmbedPca]]): planted anisotropy
  * must be recovered — direction, dominance and determinism.
  */
class EmbedPcaSpec extends SparkSpec {

  test("planted dominant axis is recovered with max magnitude and deterministically") {
    val out = SparkEntry.queries("embed_pca_top")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64, s"64 dims, got ${out.size}")
    // normalization contract: the peak coordinate is exactly ±1e6
    assert(out.values.map(math.abs).max == 1000000L,
      s"max |v| must be the 1e6 normalization: ${out.values.toSeq.sortBy(-_).take(3)}")
    CacheRegistry.clear()
    // determinism: an UNCACHED re-solve (not the per-sfDir memo, which
    // would make this vacuous) is bit-identical
    val again = EmbedPca.solveUncached(spark, sf).v.zipWithIndex
      .map { case (v, i) => i.toLong -> v.toLong }.toMap
    assert(again == out, "power iteration must be exactly deterministic")
    CacheRegistry.clear()
  }

  test("a hand-planted 2-cluster anisotropy concentrates the eigenvector on its axis") {
    import spark.implicits._
    // 3-dim vectors: variance lives almost entirely on dim 1 (values
    // ±10), dims 0/2 carry small noise — the top PC must peak on dim 1
    val rows = (0L until 40L).map { k =>
      val big = if (k % 2 == 0) 10.0f else -10.0f
      (k, Seq(0.01f * (k % 3), big, 0.02f * (k % 2)))
    }
    val emb = rows.toDF("vec_id", "embedding")
    // route through a scratch sfDir-shaped run: reuse the operator's
    // internals via a temp parquet table
    val dir = java.nio.file.Files.createTempDirectory("pcaspec").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("embed_pca_top")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val peak = out.maxBy { case (_, v) => math.abs(v) }._1
    assert(peak == 1L, s"dominant axis must be dim 1: $out")
    assert(math.abs(out(0L)) < 100000L && math.abs(out(2L)) < 100000L,
      s"noise dims must stay an order below the peak: $out")
    CacheRegistry.clear()
    // the same collapsed fixture scores near-total anisotropy (λmax/Σλ
    // → 1e6 at the x1e6 floor scale); the real fixture corpus spreads
    // its variance and scores two orders below
    val aniso = SparkEntry.queries("embed_anisotropy")(spark, dir)
      .collect().head
    assert(aniso.getLong(0) > 990000L && aniso.getLong(1) == 1L,
      s"collapsed space must score ~1e6 on its axis: $aniso")
    CacheRegistry.clear()
    val corpus = SparkEntry.queries("embed_anisotropy")(spark, sf)
      .collect().head
    assert(corpus.getLong(0) < 200000L,
      s"the fixture corpus is not collapsed: $corpus")
    CacheRegistry.clear()
  }
}
