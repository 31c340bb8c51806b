package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** The BPE trainer and encoder: deterministic merges, exact greedy apply,
  * and the shipped seed model's sanity. The subword-level ORACLE proof
  * lives in the bpe_tokenize query (the DuckDB recursive-CTE apply of the
  * same merges); this spec covers what SQL cannot — the training loop.
  */
class BpeSpec extends SparkSpec {

  test("trainer: Sennrich loop is deterministic and actually compresses") {
    // the classic BPE teaching histogram (Sennrich et al. 2016, fig. 1)
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m1 = Bpe.trainFromHistogram(hist, 10)
    val m2 = Bpe.trainFromHistogram(hist, 10)
    assert(m1 == m2, "training must be deterministic")
    assert(m1.nonEmpty)
    // 'es' (9 occurrences, newest+widest) must be learned before 'lo' (7)
    val r = Bpe.ranks(m1)
    assert(r.contains(("e", "s")) && r.contains(("l", "o")))
    assert(r(("e", "s")) < r(("l", "o")),
      s"highest-frequency pair must merge first: $m1")
    // applying the merges shrinks every multi-char word's token count
    // below its char count, and segments always concatenate back
    for ((w, _) <- hist) {
      val segs = Bpe.encode(w, r)
      assert(segs.mkString("") == w, s"lossless: $w -> $segs")
      assert(segs.length < w.length, s"compression: $w -> $segs")
    }
  }

  test("encoder: best-rank-first greedy apply, all occurrences, left to right") {
    val r = Bpe.ranks(Seq(("a", "b"), ("ab", "c"), ("c", "a")))
    // rank order wins: (a,b) before (c,a), then (ab,c) cascades
    assert(Bpe.encode("abc", r) == Vector("abc"))
    assert(Bpe.encode("cab", r) == Vector("c", "ab"))
    // all occurrences in one pass, left-to-right non-overlapping
    assert(Bpe.encode("ababab", r) == Vector("ab", "ab", "ab"))
    val rr = Bpe.ranks(Seq(("a", "a")))
    assert(Bpe.encode("aaa", rr) == Vector("aa", "a"))
    // unknown chars stay single symbols
    assert(Bpe.encode("xyz", r) == Vector("x", "y", "z"))
    assert(Bpe.encode("a", r) == Vector("a"))
  }

  test("seed model: full budget, English subwords, stable across evaluations") {
    val m = Bpe.SeedMerges
    assert(m.size == Bpe.NumMerges, s"expected ${Bpe.NumMerges} merges, got ${m.size}")
    val symbols = m.map { case (a, b) => a + b }.toSet
    // the seed corpus is built to teach these
    for (s <- Seq("th", "the", "ing")) {
      assert(symbols.contains(s), s"seed model should learn '$s': $symbols")
    }
    assert(m.toSet.size == m.size, "no duplicate merges")
  }

  test("corpus training: the same trainer learns from the real documents table") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val m = Bpe.train(docs, 32)
    assert(m.size == 32)
    assert(m == Bpe.train(docs, 32), "corpus training must be deterministic")
    // the learned model compresses the corpus it was trained on: total
    // subword count strictly below total character count of the tokens
    val r = Bpe.ranks(m)
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect().map(x => (x.getString(0), x.getLong(1)))
    val chars = words.map { case (w, f) => w.length * f }.sum
    val subs = words.map { case (w, f) => Bpe.encode(w, r).length * f }.sum
    assert(subs < chars,
      s"corpus-trained merges must compress: $subs subwords vs $chars chars")
  }
}
