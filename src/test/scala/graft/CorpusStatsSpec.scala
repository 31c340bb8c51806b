package graft

import graft.operators.CorpusStats

/** Collocation lift and vocabulary-coverage pins on planted corpora. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("a planted phrase tops the lift ranking with the hand value") {
    // "neural network" always adjacent (5x); filler words common enough
    // that chance pairs score low. Bigrams: 5x (neural,network) + filler.
    val docs = (1 to 5).map(i =>
      (i.toLong, "neural network is a tool and a tool is common")).toDF("doc_id", "text")
    val rows = CorpusStats.collocationsOf(docs, 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(5))).toMap
    // corpus: per doc 10 tokens -> 9 bigrams, T = 45
    // n(neural,network)=5, n(neural)=5, n(network)=5
    // lift_bp = (5 * 45 * 10000) div (5 * 5) = 90000
    assert(rows((("neural", "network")))._1 === 5L)
    assert(rows((("neural", "network")))._2 === 90000L)
    // "a tool" occurs 2x/doc = 10 with n(a)=10, n(tool)=10:
    // (10 * 45 * 10000) div 100 = 45000 — half the planted lift
    assert(rows((("a", "tool")))._2 === 45000L)
    CacheRegistry.clear()
  }

  test("vocab coverage: head vocab by count then token, oov floor-bp") {
    // counts: x:4, y:3, z:2, q:1 → vocab(size 2) = {x, y}
    val docs = Seq(
      (1L, "x x y z"), // 4 tokens, 3 in vocab → oov 2500 bp
      (2L, "x x y y z q"), // 6 tokens, 4 in vocab → oov 3333 bp
      (3L, ""), // 0 tokens → null oov
      (4L, "z")) // 1 token, 0 in vocab → 10000 bp
      .toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverageOf(docs, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) === ((4L, 3L, 2500L)))
    assert(got(2L) === ((6L, 4L, 3333L)))
    assert(got(3L) === ((0L, 0L, -1L)))
    assert(got(4L) === ((1L, 0L, 10000L)))
    CacheRegistry.clear()
  }

  test("vocab ties break on token order, not arrival order") {
    // b and a tie at 2; vocab(1) takes 'a' (count desc, token asc)
    val docs = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverageOf(docs, 1).collect().head
    assert(got.getLong(2) === 2L) // the two 'a's
    CacheRegistry.clear()
  }
  test("corpus_divergence: in-mix sources score zero, a drifted source scores positive") {
    import spark.implicits._
    // s0 and s1 share the corpus-average distribution exactly (identical
    // docs), so p = q for every term -> every contribution floors to 0.
    // s2 speaks a disjoint vocabulary -> its mass diverges AND it skews
    // the mix, so s0/s1 vs the NEW mix pick up positive KL too; build the
    // zero case and the drift case as separate corpora to keep it exact.
    val uniform = Seq(
      (0L, "alpha beta gamma delta", "s0"),
      (1L, "alpha beta gamma delta", "s1")).toDF("doc_id", "text", "source")
    val zero = CorpusStats.divergenceOf(uniform).collect()
    assert(zero.length == 2)
    assert(zero.forall(_.getAs[Long]("kl_x1e6") == 0L),
      s"uniform mix must have zero KL: ${zero.mkString(";")}")
    CacheRegistry.clear()

    val drifted = Seq(
      (0L, "alpha beta gamma delta", "s0"),
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "zeta zeta zeta zeta", "s2")).toDF("doc_id", "text", "source")
    val out = CorpusStats.divergenceOf(drifted)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("kl_x1e6")).toMap
    // the disjoint-vocabulary source diverges hardest: p=1 on zeta,
    // q=1/3 -> KL = ln(3) ~ 1.0986e6 at the 1e6 floor scale
    assert(out("s2") == math.floor(math.log(3.0) * 1e6).toLong, s"$out")
    assert(out("s0") > 0L && out("s0") == out("s1"), s"$out")
    assert(out("s2") > out("s0"), s"$out")
    CacheRegistry.clear()
  }

  test("vocab growth: partition laws and a planted saturation curve") {
    // 20 docs, ids 0..19 -> decile d covers ids {2d, 2d+1}. First half
    // mints two fresh types per doc; second half repeats a closed
    // vocabulary: the curve must saturate exactly at the half mark.
    val docs = (0L until 20L).map { i =>
      val text = if (i < 10) s"t${2 * i} t${2 * i + 1} common"
                 else "common filler filler"
      (i, text)
    }.toDF("doc_id", "text")
    val out = CorpusStats.vocabGrowthOf(docs,
        graft.operators.Retrieval.termFreqs(docs))
      .collect().map(r => (r.getAs[Long]("decile"), r.getAs[Long]("docs"),
        r.getAs[Long]("tokens"), r.getAs[Long]("new_types"),
        r.getAs[Long]("docs_cum"), r.getAs[Long]("tokens_cum"),
        r.getAs[Long]("vocab_cum")))
    assert(out.map(_._1).toSeq == (0L until 10L).toSeq, s"${out.toSeq}")
    assert(out.forall(_._2 == 2L), "two docs per decile")
    // partition laws: per-decile columns sum to the corpus totals, and
    // the cumulative columns end on them
    assert(out.map(_._4).sum == 22L, "20 minted types + common + filler")
    assert(out.last._5 == 20L && out.last._7 == 22L)
    assert(out.map(_._3).sum == out.last._6)
    // saturation: deciles 0-4 mint (2 types per doc; decile 0 also mints
    // 'common'), decile 5 mints only 'filler', 6-9 mint nothing
    assert(out(0)._4 == 5L && (1 to 4).forall(out(_)._4 == 4L),
      s"${out.toSeq}")
    assert(out(5)._4 == 1L && (6 to 9).forall(out(_)._4 == 0L),
      s"${out.toSeq}")
    CacheRegistry.clear()
  }
}
