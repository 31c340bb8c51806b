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
    // clearAll, not clear: the floored-vector frame is session-SHARED
    // now, so a per-query clear would leave the re-solve reading run
    // A's cache and weaken the determinism claim to the solve alone
    CacheRegistry.clearAll()
    // determinism: an UNCACHED re-solve (not the per-sfDir memo, which
    // would make this vacuous) is bit-identical
    val again = EmbedPca.solveUncached(spark, sf).v.zipWithIndex
      .map { case (v, i) => i.toLong -> v.toLong }.toMap
    assert(again == out, "power iteration must be exactly deterministic")
    CacheRegistry.clearAll()
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

  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      case e => Seq(e)
    }.flatten

  test("PC projection splits the planted clusters by sign; map-only after the solve") {
    import spark.implicits._
    val rows = (0L until 40L).map { k =>
      val big = if (k % 2 == 0) 10.0f else -10.0f
      (k, Seq(0.01f * (k % 3), big, 0.02f * (k % 2)))
    }
    val dir = java.nio.file.Files.createTempDirectory("pcaproj").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val df = SparkEntry.queries("embed_pc_projection")(spark, dir)
    val out = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 40, s"one projection per row: ${out.size}")
    // the planted axis carries ±10 → |proj| ≈ 10·1000·1e6 = 1e10; noise
    // dims contribute ≤ 0.02·1000·1e5 — three orders below
    val evens = (0L until 40L by 2).map(out)
    val odds = (1L until 40L by 2).map(out)
    assert(evens.forall(v => math.abs(v) > 5000000000L) &&
      odds.forall(v => math.abs(v) > 5000000000L),
      s"planted mass must dominate the projection: ${out.take(4)}")
    assert(evens.map(_.sign).toSet.size == 1 && odds.map(_.sign).toSet.size == 1
      && evens.head.sign == -odds.head.sign,
      "the two planted clusters must land on opposite signs")
    // plan pin: with the eigenvector a literal, scoring is MAP-ONLY —
    // zero exchanges in the executed plan (the scaladoc claim)
    df.count()
    val nodes = unwrap(df.queryExecution.executedPlan)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      s"projection must not shuffle: ${nodes.map(_.getClass.getSimpleName)}")
    CacheRegistry.clearAll()
  }

  test("label separation: aligned labels explain the scatter, shuffled labels don't") {
    import spark.implicits._
    // same 2-cluster geometry as the anisotropy fixture; 'aligned' labels
    // follow the ±10 split exactly, 'shuffled' labels mix both signs
    // evenly into each label (independent of the geometry)
    def fixture(labelOf: Long => Int): String = {
      val rows = (0L until 40L).map { k =>
        val big = if (k % 2 == 0) 10.0f else -10.0f
        (k, Seq(0.01f * (k % 3), big, 0.02f * (k % 2)), labelOf(k))
      }
      val dir = java.nio.file.Files.createTempDirectory("pcasep").toString
      rows.toDF("vec_id", "embedding", "label").write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      dir
    }
    def run(dir: String) = SparkEntry.queries("embed_label_separation")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    val aligned = run(fixture(k => (k % 2).toInt))
    assert(aligned.map(_._2).toSeq == Seq(20L, 20L),
      s"two balanced labels: ${aligned.toSeq}")
    assert(aligned.head._3 > 9000L,
      s"geometry-aligned labels must explain ~all scatter: ${aligned.toSeq}")
    CacheRegistry.clearAll()
    val shuffled = run(fixture(k => ((k / 2) % 2).toInt))
    assert(shuffled.head._3 < 500L,
      s"geometry-independent labels must explain ~none: ${shuffled.toSeq}")
    CacheRegistry.clearAll()
  }

  test("pc drift: a planted stable axis reads near-total alignment across batches") {
    import spark.implicits._
    // the dominant ±10 axis is present in every vec_id-mod-3 batch, so
    // each published model recovers (up to sign) the same eigenvector
    val rows = (0L until 60L).map { k =>
      val big = if (k % 2 == 0) 10.0f else -10.0f
      (k, Seq(0.01f * (k % 3), big, 0.02f * (k % 2)))
    }
    val dir = java.nio.file.Files.createTempDirectory("pcadrift").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("embed_pc_drift")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(2L, 3L), s"one row per published pair: $out")
    assert(out.values.forall(v => math.abs(v) > 9900L && math.abs(v) <= 10000L),
      s"a stable planted axis must stay aligned across versions: $out")
    CacheRegistry.clearAll()
  }

  test("outlier scan surfaces a planted far vector first, in total order") {
    import spark.implicits._
    val rows = (0L until 40L).map { k =>
      (k, Seq(0.01f * (k % 3), 0.02f * (k % 2), 0.01f))
    } :+ (99L, Seq(50.0f, 50.0f, 50.0f))
    val dir = java.nio.file.Files.createTempDirectory("pcaout").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val top = SparkEntry.queries("embed_centroid_outliers")(spark, dir).collect()
    assert(top.length == 20, s"top-k cut: ${top.length}")
    assert(top.head.getLong(0) == 99L,
      s"the planted far vector must rank first: ${top.head}")
    assert(top.head.getLong(1) > 100L * top(1).getLong(1),
      s"planted outlier must dominate the tight cluster: " +
        s"${top.head.getLong(1)} vs ${top(1).getLong(1)}")
    val order = top.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(order == order.sorted, "(dist2 DESC, vec_id) total order")
    CacheRegistry.clearAll()
  }

  test("dim stats: a planted dead dimension reads zero variance, full zero count") {
    import spark.implicits._
    val rows = (0L until 40L).map { k =>
      val big = if (k % 2 == 0) 10.0f else -10.0f
      (k, Seq(0.0f, big, 0.001f * k))
    }
    val dir = java.nio.file.Files.createTempDirectory("pcadim").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("embed_dim_stats")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(0L) == ((0L, 0L, 0L, 0L, 40L)),
      s"dead dim: all-zero, zero variance, zero_ct = n: ${out(0L)}")
    // dim 1 = ±10 → floored ±10000, mean 0, var exactly 1e8, no zeros
    assert(out(1L) == ((-10000L, 10000L, 0L, 100000000L, 0L)),
      s"planted ±10 axis stats: ${out(1L)}")
    assert(out(2L)._4 > 0L && out(2L)._5 == 1L,
      s"ramp dim varies and zeroes only at k=0: ${out(2L)}")
    CacheRegistry.clearAll()
  }

  test("plan pin: the outlier top-k is TakeOrdered, never a global sort") {
    // (label separation and drift return driver-built local frames, so
    // their returned plans carry nothing to pin — the distributed work
    // is the collected aggregations, already budget-bounded by design)
    val df = SparkEntry.queries("embed_centroid_outliers")(spark, sf)
    df.count()
    val nodes = unwrap(df.queryExecution.executedPlan)
      .map(_.getClass.getSimpleName)
    assert(nodes.exists(_.contains("TakeOrderedAndProject")),
      s"top-20 must be TakeOrderedAndProject, not a global sort: $nodes")
    assert(!nodes.exists(_ == "SortExec"),
      s"no global sort may materialize: $nodes")
    CacheRegistry.clearAll()
  }
}
